"""Numpy oracle for BoostTrack semantics.

Independent float64 re-statement of the reference algorithm
(boxmot/trackers/bbox/boosttrack/boosttrack.py:20-560 and assoc.py) used
only to validate the jitted struct-of-arrays tracker:

  * constant-noise XYHR Kalman filter (motion/kalman_filters/xyhr.py:
    10-110: P0 = 10*I with 1000x velocity block, Q = diag(1, .01 vel),
    R = diag([1, 1, 10, .01]))
  * per-track confidence 0.9^(7-age) warming up, else 0.9^(tsu-1)
  * DLO / DUO detection-confidence boosts (boosttrack.py:425-529)
  * multi-cue association cost (assoc.py:156-203) with the unique-
    candidate shortcut and validity gate of match()/linear_assignment()

Known reference quirk NOT replicated: match() calls `.max()` on an
empty binary matrix when a frame has zero detections while tracks
exist, which raises in numpy — the oracle (like the jitted step)
treats such frames as "no matches" instead.
"""

import numpy as np
import scipy.optimize

MH_LIMIT = 13.2767

_F = np.eye(8)
for _i in range(4):
    _F[_i, 4 + _i] = 1.0
_H = np.eye(4, 8)
_P0 = np.diag([10.0] * 4 + [10000.0] * 4)
_Q = np.diag([1.0] * 4 + [0.01] * 4)
_R = np.diag([1.0, 1.0, 10.0, 0.01])


def xyxy2z(b):
    w = b[2] - b[0]
    h = b[3] - b[1]
    return np.array([b[0] + w / 2.0, b[1] + h / 2.0, h, w / (h + 1e-6)])


def z2xyxy(x):
    h, r = x[2], x[3]
    w = 0.0 if r <= 0 else r * h
    return np.array([x[0] - w / 2.0, x[1] - h / 2.0, x[0] + w / 2.0, x[1] + h / 2.0])


class XYHROracle:
    """Constant-noise XYHR filter (kalman_filters/xyhr.py:160-378)."""

    def __init__(self, z):
        self.x = np.zeros(8)
        self.x[:4] = self._clamp_z(np.asarray(z, float).copy())
        self.P = _P0.copy()

    @staticmethod
    def _clamp_z(z):
        z[2] = max(z[2], 1e-4)
        z[3] = max(z[3], 1e-4)
        return z

    def _enforce(self):
        self.x[2] = max(self.x[2], 1e-4)
        self.x[3] = max(self.x[3], 1e-4)
        self.P = 0.5 * (self.P + self.P.T)

    def predict(self):
        self.x = _F @ self.x
        self.P = _F @ self.P @ _F.T + _Q
        self._enforce()

    def update(self, z):
        z = self._clamp_z(np.asarray(z, float).copy())
        s = _H @ self.P @ _H.T + _R
        k = np.linalg.solve(s, (self.P @ _H.T).T).T
        self.x = self.x + k @ (z - _H @ self.x)
        self.P = self.P - k @ s @ k.T
        self._enforce()


def iou_batch(b1, b2):
    b1 = b1[:, None, :]
    b2 = b2[None, :, :]
    xx1 = np.maximum(b1[..., 0], b2[..., 0])
    yy1 = np.maximum(b1[..., 1], b2[..., 1])
    xx2 = np.minimum(b1[..., 2], b2[..., 2])
    yy2 = np.minimum(b1[..., 3], b2[..., 3])
    wh = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return wh / (a1 + a2 - wh)


def soft_biou_batch(dets, trks5):
    """assoc.py:69-110 — both boxes buffered by the TRACK's confidence."""
    b1 = dets[:, None, :4]
    b2 = trks5[None, :, :4]
    c2 = trks5[None, :, 4]
    k1, k2 = 0.25, 0.5
    e1w = (b1[..., 2] - b1[..., 0]) * (1 - c2) * k1
    e1h = (b1[..., 3] - b1[..., 1]) * (1 - c2) * k1
    e2w = (b2[..., 2] - b2[..., 0]) * (1 - c2) * k2
    e2h = (b2[..., 3] - b2[..., 1]) * (1 - c2) * k2
    x11, y11, x12, y12 = b1[..., 0] - e1w, b1[..., 1] - e1h, b1[..., 2] + e1w, b1[..., 3] + e1h
    x21, y21, x22, y22 = b2[..., 0] - e2w, b2[..., 1] - e2h, b2[..., 2] + e2w, b2[..., 3] + e2h
    xx1, yy1 = np.maximum(x11, x21), np.maximum(y11, y21)
    xx2, yy2 = np.minimum(x12, x22), np.minimum(y12, y22)
    wh = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
    return wh / ((x12 - x11) * (y12 - y11) + (x22 - x21) * (y22 - y21) - wh)


def shape_similarity(dets, trks, s_sim_corr):
    dw = (dets[:, 2] - dets[:, 0]).reshape(-1, 1)
    dh = (dets[:, 3] - dets[:, 1]).reshape(-1, 1)
    tw = (trks[:, 2] - trks[:, 0]).reshape(1, -1)
    th = (trks[:, 3] - trks[:, 1]).reshape(1, -1)
    if s_sim_corr:
        return np.exp(-(np.abs(dw - tw) / np.maximum(dw, tw) + np.abs(dh - th) / np.maximum(dh, th)))
    # v1 quirk: both terms normalized by max(dw, tw) (assoc.py:15-23)
    return np.exp(-(np.abs(dw - tw) / np.maximum(dw, tw) + np.abs(dh - th) / np.maximum(dw, tw)))


def mh_similarity(md):
    """assoc.py:37-48 — clamped entries contribute exp(0)=1 to the
    per-column softmax denominator before being zeroed."""
    mask = md > MH_LIMIT
    s = MH_LIMIT - np.where(mask, MH_LIMIT, md)
    e = np.exp(s)
    sim = e / e.sum(0, keepdims=True)
    return np.where(mask, 0.0, sim)


def _match(cost, threshold):
    if cost.size == 0:
        return np.empty((0, 2), int)
    a = (cost > threshold).astype(int)
    if a.sum(1).max() == 1 and a.sum(0).max() == 1:
        return np.stack(np.where(a), axis=1)
    r, c = scipy.optimize.linear_sum_assignment(-cost)
    return np.stack([r, c], axis=1)


class _Trk:
    def __init__(self, det, tid, emb=None):
        self.kf = XYHROracle(xyxy2z(det[:4]))
        self.id = tid
        self.conf = det[4]
        self.cls = det[5]
        self.det_ind = det[6]
        self.emb = None if emb is None else np.asarray(emb, float).copy()
        self.hit_streak = 0
        self.age = 0
        self.time_since_update = 0

    def predict(self):
        self.kf.predict()
        self.age += 1
        if self.time_since_update > 0:
            self.hit_streak = 0
        self.time_since_update += 1
        return z2xyxy(self.kf.x)

    def get_confidence(self, coef=0.9):
        if self.age < 7:
            return coef ** (7 - self.age)
        return coef ** (self.time_since_update - 1)

    def update(self, det):
        self.time_since_update = 0
        self.hit_streak += 1
        self.kf.update(xyxy2z(det[:4]))
        self.conf = det[4]
        self.cls = det[5]
        self.det_ind = det[6]

    def update_emb(self, emb, alpha):
        self.emb = alpha * self.emb + (1 - alpha) * emb
        self.emb /= np.linalg.norm(self.emb)

    def camera_update(self, warp):
        wm = np.asarray(warp, float)
        if wm.shape == (2, 3):
            wm = np.vstack([wm, [0.0, 0.0, 1.0]])
        x1, y1, x2, y2 = z2xyxy(self.kf.x)
        p1 = wm @ np.array([x1, y1, 1.0])
        p2 = wm @ np.array([x2, y2, 1.0])
        w, h = p2[0] - p1[0], p2[1] - p1[1]
        self.kf.x[:4] = [p1[0] + w / 2, p1[1] + h / 2, h, w / h]


class BoostTrackOracle:
    def __init__(
        self,
        det_thresh=0.5,
        max_age=30,
        min_hits=3,
        iou_threshold=0.3,
        min_box_area=10,
        aspect_ratio_thresh=1.6,
        lambda_iou=0.5,
        lambda_mhd=0.25,
        lambda_shape=0.25,
        use_dlo_boost=True,
        use_duo_boost=True,
        dlo_boost_coef=0.65,
        s_sim_corr=False,
        use_rich_s=False,
        use_sb=False,
        use_vt=False,
        with_reid=False,
    ):
        self.det_thresh = det_thresh
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.min_box_area = min_box_area
        self.aspect_ratio_thresh = aspect_ratio_thresh
        self.lambda_iou = lambda_iou
        self.lambda_mhd = lambda_mhd
        self.lambda_shape = lambda_shape
        self.use_dlo_boost = use_dlo_boost
        self.use_duo_boost = use_duo_boost
        self.dlo_boost_coef = dlo_boost_coef
        self.s_sim_corr = s_sim_corr
        self.use_rich_s = use_rich_s
        self.use_sb = use_sb
        self.use_vt = use_vt
        self.with_reid = with_reid
        self.trackers = []
        self.frame_count = 0
        self.next_id = 1

    def _mh_dist(self, dets):
        """Diagonal-normalized squared distance (boosttrack.py:430-445)."""
        if not self.trackers or len(dets) == 0:
            return np.zeros((len(dets), len(self.trackers)))
        z = np.stack([xyxy2z(d[:4]) for d in dets])
        x = np.stack([t.kf.x[:4] for t in self.trackers])
        sig_inv = np.stack([1.0 / np.diag(t.kf.P[:4, :4]) for t in self.trackers])
        diff = z[:, None, :] - x[None, :, :]
        return (diff**2 * sig_inv[None, :, :]).sum(2)

    def _trks5(self):
        return np.array(
            [[*z2xyxy(t.kf.x), t.get_confidence()] for t in self.trackers]
        ).reshape(-1, 5)

    def _dlo_boost(self, dets):
        """boosttrack.py:489-529."""
        if len(dets) == 0 or not self.trackers:
            return dets
        trks5 = self._trks5()
        if self.use_rich_s:
            mhd_sim = mh_similarity(self._mh_dist(dets))
            ss = shape_similarity(dets, trks5, self.s_sim_corr)
            S = (mhd_sim + ss + soft_biou_batch(dets, trks5)) / 3.0
        else:
            S = iou_batch(dets[:, :4], trks5[:, :4])
        if not self.use_sb and not self.use_vt:
            dets[:, 4] = np.maximum(dets[:, 4], S.max(1) * self.dlo_boost_coef)
            return dets
        if self.use_sb:
            alpha = 0.65
            dets[:, 4] = np.maximum(
                dets[:, 4], alpha * dets[:, 4] + (1 - alpha) * S.max(1) ** 1.5
            )
        if self.use_vt:
            tsu = np.array([t.time_since_update - 1 for t in self.trackers])
            hit = (S > np.maximum(0.95 - tsu, 0.8)).max(1)
            dets[hit, 4] = np.maximum(dets[hit, 4], self.det_thresh + 1e-5)
        return dets

    def _duo_boost(self, dets):
        """boosttrack.py:447-487."""
        if len(dets) == 0 or not self.trackers:
            return dets
        md = self._mh_dist(dets)
        mask = (md.min(1) > MH_LIMIT) & (dets[:, 4] < self.det_thresh)
        boost_inds = np.where(mask)[0]
        if len(boost_inds) == 0:
            return dets
        bdiou = iou_batch(dets[boost_inds, :4], dets[boost_inds, :4]) - np.eye(
            len(boost_inds)
        )
        bdiou_max = bdiou.max(1)
        remaining = list(boost_inds[bdiou_max <= 0.3])
        for bi in np.where(bdiou_max > 0.3)[0]:
            peers = boost_inds[np.where(bdiou[bi] > 0.3)[0]]
            group = np.append(
                np.intersect1d(boost_inds[bdiou_max > 0.3], peers), boost_inds[bi]
            )
            if dets[boost_inds[bi], 4] == dets[group, 4].max():
                remaining.append(boost_inds[bi])
        dets[np.array(remaining, int), 4] = self.det_thresh + 1e-4
        return dets

    def _associate(self, dets, trks5, confs, scores, emb_cost, md):
        """assoc.py:117-203."""
        if not self.trackers:
            return np.empty((0, 2), int), list(range(len(dets))), []
        iou = iou_batch(dets[:, :4], trks5[:, :4])
        cost = iou.copy()
        conf = scores.reshape(-1, 1) * confs.reshape(1, -1)
        conf = np.where(iou < self.iou_threshold, 0.0, conf)
        cost += self.lambda_iou * conf * iou
        if md.size > 0:
            cost += self.lambda_mhd * mh_similarity(md)
            cost += self.lambda_shape * conf * shape_similarity(
                dets, trks5, self.s_sim_corr
            )
        if emb_cost is not None:
            lam = (1 + self.lambda_iou + self.lambda_shape + self.lambda_mhd) * 1.5
            cost = cost + lam * emb_cost
        pairs = _match(cost, self.iou_threshold)
        u_det = [d for d in range(len(dets)) if d not in pairs[:, 0]]
        u_trk = [t for t in range(len(self.trackers)) if t not in pairs[:, 1]]
        matches = []
        for d, t in pairs:
            ok = iou[d, t] >= self.iou_threshold or (
                emb_cost is not None
                and iou[d, t] >= self.iou_threshold / 2
                and emb_cost[d, t] >= 0.75
            )
            if ok:
                matches.append((d, t))
            else:
                u_det.append(d)
                u_trk.append(t)
        return np.array(matches, int).reshape(-1, 2), u_det, u_trk

    def update(self, dets, embs=None, warp=None):
        dets = np.asarray(dets, float).reshape(-1, 6).copy()
        dets = np.hstack([dets, np.arange(len(dets), dtype=float).reshape(-1, 1)])
        self.frame_count += 1

        if warp is not None:
            for t in self.trackers:
                t.camera_update(warp)

        rows = []
        for t in self.trackers:
            pos = t.predict()
            rows.append([*pos, t.get_confidence()])
        trks5 = np.array(rows).reshape(-1, 5)
        confs = trks5[:, 4] if len(rows) else np.zeros(0)

        if self.use_dlo_boost:
            dets = self._dlo_boost(dets)
        if self.use_duo_boost:
            dets = self._duo_boost(dets)

        keep = dets[:, 4] >= self.det_thresh
        dets = dets[keep]
        scores = dets[:, 4]
        dets_embs = np.ones((len(dets), 1))
        if self.with_reid and embs is not None:
            dets_embs = np.asarray(embs, float)[keep]

        emb_cost = None
        if self.with_reid and self.trackers:
            t_embs = np.stack([t.emb for t in self.trackers])
            emb_cost = dets_embs @ t_embs.T if len(dets) else np.empty((0, len(t_embs)))

        md = self._mh_dist(dets)
        matches, u_det, _ = self._associate(dets, trks5, confs, scores, emb_cost, md)

        trust = (scores - self.det_thresh) / (1 - self.det_thresh)
        dets_alpha = 0.95 + 0.05 * (1 - trust)

        for d, t in matches:
            self.trackers[t].update(dets[d])
            if self.with_reid:
                self.trackers[t].update_emb(dets_embs[d], alpha=dets_alpha[d])

        # reference appends new tracks in unmatched-list order: never-
        # matched detections ascending, then invalid-match rejects
        # (boosttrack.py:390-395 over assoc.py:132-151)
        for d in u_det:
            if dets[d, 4] >= self.det_thresh:
                self.trackers.append(
                    _Trk(dets[d], self.next_id, emb=dets_embs[d] if self.with_reid else None)
                )
                self.next_id += 1

        out = []
        for t in self.trackers:
            if t.time_since_update < 1 and (
                t.hit_streak >= self.min_hits or self.frame_count <= self.min_hits
            ):
                out.append([*z2xyxy(t.kf.x), t.id, t.conf, t.cls, t.det_ind])
        self.trackers = [t for t in self.trackers if t.time_since_update <= self.max_age]

        out = np.array(out, float).reshape(-1, 8)
        w = out[:, 2] - out[:, 0]
        h = out[:, 3] - out[:, 1]
        keep = (w / h <= self.aspect_ratio_thresh) & (w * h > self.min_box_area)
        return out[keep]
