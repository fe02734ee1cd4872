"""Numpy oracle for OC-SORT semantics (reference ocsort.py:17-556),
including the ORU freeze/unfreeze replay (xysr.py:379-440)."""

import numpy as np
from scipy.optimize import linear_sum_assignment


def xyxy2xysr(b):
    w = b[2] - b[0]
    h = b[3] - b[1]
    return np.array([b[0] + w / 2, b[1] + h / 2, max(w * h, 1e-6), max(w / (h + 1e-6), 1e-6)])


def xysr2xyxy(x):
    w = np.sqrt(max(x[2] * x[3], 1e-12))
    h = x[2] / max(w, 1e-6)
    return np.array([x[0] - w / 2, x[1] - h / 2, x[0] + w / 2, x[1] + h / 2])


def iou_batch(b1, b2):
    if len(b1) == 0 or len(b2) == 0:
        return np.zeros((len(b1), len(b2)))
    b1 = np.asarray(b1)[:, None]
    b2 = np.asarray(b2)[None, :]
    xx1 = np.maximum(b1[..., 0], b2[..., 0])
    yy1 = np.maximum(b1[..., 1], b2[..., 1])
    xx2 = np.minimum(b1[..., 2], b2[..., 2])
    yy2 = np.minimum(b1[..., 3], b2[..., 3])
    wh = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return wh / np.maximum(a1 + a2 - wh, 1e-12)


class XYSRFilter:
    def __init__(self, q_xy=0.01, q_s=1e-4):
        self.F = np.eye(7)
        self.F[0, 4] = self.F[1, 5] = self.F[2, 6] = 1.0
        self.Q = np.eye(7)
        self.Q[4:6, 4:6] *= q_xy
        self.Q[6, 6] *= q_s
        self.R = np.diag([1.0, 1.0, 10.0, 10.0])
        self.H = np.eye(4, 7)
        self.x = np.zeros(7)
        self.P = np.diag([10.0, 10, 10, 10, 10000, 10000, 10000])
        self.observed = False
        self.saved = None
        self.last_measurement = None

    def predict(self):
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q
        self.x[2] = max(self.x[2], 1e-6)
        self.x[3] = max(self.x[3], 1e-6)

    def _kf_update(self, z):
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ (z - self.H @ self.x)
        self.P = self.P - K @ S @ K.T
        self.x[2] = max(self.x[2], 1e-6)
        self.x[3] = max(self.x[3], 1e-6)

    def update(self, z, gap):
        """z: (4,) xysr or None; gap = time_since_update at rejoin."""
        if z is None:
            if self.observed:
                self.saved = (self.x.copy(), self.P.copy(), self.last_measurement)
            self.observed = False
            return
        z = z.copy()
        z[2] = max(z[2], 1e-6)
        z[3] = max(z[3], 1e-6)
        if not self.observed and self.saved is not None and self.last_measurement is not None and gap > 1:
            # ORU replay
            self.x, self.P, m1 = self.saved[0].copy(), self.saved[1].copy(), self.saved[2]
            x1, y1, s1, r1 = m1
            w1, h1 = np.sqrt(s1 * r1), np.sqrt(s1 / r1)
            x2, y2, s2, r2 = z
            w2, h2 = np.sqrt(s2 * r2), np.sqrt(s2 / r2)
            dx, dy = (x2 - x1) / gap, (y2 - y1) / gap
            dw, dh = (w2 - w1) / gap, (h2 - h1) / gap
            for i in range(gap):
                xi = x1 + (i + 1) * dx
                yi = y1 + (i + 1) * dy
                wi = w1 + (i + 1) * dw
                hi = h1 + (i + 1) * dh
                self._kf_update(np.array([xi, yi, max(wi * hi, 1e-6), max(wi / hi, 1e-6)]))
                if i != gap - 1:
                    self.predict()
        self.observed = True
        self._kf_update(z)
        self.last_measurement = z


def speed_direction(b1, b2):
    cx1, cy1 = (b1[0] + b1[2]) / 2, (b1[1] + b1[3]) / 2
    cx2, cy2 = (b2[0] + b2[2]) / 2, (b2[1] + b2[3]) / 2
    speed = np.array([cy2 - cy1, cx2 - cx1])
    return speed / (np.sqrt((speed**2).sum()) + 1e-6)


class _Track:
    count = 0

    def __init__(self, det, cls, det_ind, delta_t, q_xy, q_s):
        self.kf = XYSRFilter(q_xy, q_s)
        self.kf.x[:4] = xyxy2xysr(det[:4])
        self.conf = det[4]
        self.cls = cls
        self.det_ind = det_ind
        self.id = _Track.count
        _Track.count += 1
        self.delta_t = delta_t
        self.age = 0
        self.tsu = 0
        self.hits = 0
        self.hit_streak = 0
        self.last_obs = np.full(5, -1.0)
        self.observations = {}
        self.velocity = None

    def predict(self):
        if self.kf.x[6] + self.kf.x[2] <= 0:
            self.kf.x[6] = 0.0
        self.kf.predict()
        self.age += 1
        if self.tsu > 0:
            self.hit_streak = 0
        self.tsu += 1
        return xysr2xyxy(self.kf.x)

    def k_previous_obs(self):
        if len(self.observations) == 0:
            return np.full(5, -1.0)
        for i in range(self.delta_t):
            dt = self.delta_t - i
            if self.age - dt in self.observations:
                return self.observations[self.age - dt]
        return self.observations[max(self.observations)]

    def update(self, det, cls, det_ind):
        self.det_ind = det_ind
        if det is not None:
            self.conf = det[4]
            self.cls = cls
            if self.last_obs.sum() >= 0:
                prev = None
                for i in range(self.delta_t):
                    dt = self.delta_t - i
                    if self.age - dt in self.observations:
                        prev = self.observations[self.age - dt]
                        break
                if prev is None:
                    prev = self.last_obs
                self.velocity = speed_direction(prev, det)
            self.last_obs = det[:5].copy()
            self.observations[self.age] = det[:5].copy()
            gap = self.tsu
            self.tsu = 0
            self.hits += 1
            self.hit_streak += 1
            self.kf.update(xyxy2xysr(det[:4]), gap)
        else:
            self.kf.update(None, 0)


class OcSortOracle:
    def __init__(
        self,
        det_thresh=0.3,
        min_conf=0.1,
        max_age=30,
        min_hits=3,
        iou_threshold=0.3,
        delta_t=3,
        inertia=0.2,
        q_xy=0.01,
        q_s=1e-4,
    ):
        self.det_thresh = det_thresh
        self.min_conf = min_conf
        self.max_age = max_age
        self.min_hits = min_hits
        self.thr = iou_threshold
        self.delta_t = delta_t
        self.inertia = inertia
        self.q_xy = q_xy
        self.q_s = q_s
        self.tracks = []
        self.frame = 0
        _Track.count = 0

    def update(self, dets):
        self.frame += 1
        dets = np.asarray(dets, float)
        if dets.size == 0:
            dets = np.zeros((0, 6))
        dets = np.hstack([dets, np.arange(len(dets), dtype=float).reshape(-1, 1)])
        confs = dets[:, 4]
        d_first = dets[confs > self.det_thresh]

        trk_boxes = np.array([t.predict() for t in self.tracks]).reshape(-1, 4)
        velocities = np.array(
            [t.velocity if t.velocity is not None else np.zeros(2) for t in self.tracks]
        ).reshape(-1, 2)
        k_obs = np.array([t.k_previous_obs() for t in self.tracks]).reshape(-1, 5)
        last_boxes = np.array([t.last_obs for t in self.tracks]).reshape(-1, 5)

        # pass 1
        D, T = len(d_first), len(self.tracks)
        matched_trk = np.zeros(T, bool)
        matched_det = np.zeros(D, bool)
        if T and D:
            iou = iou_batch(d_first[:, :4], trk_boxes)  # (D, T)
            cx_d = (d_first[:, 0] + d_first[:, 2]) / 2
            cy_d = (d_first[:, 1] + d_first[:, 3]) / 2
            cx_k = (k_obs[:, 0] + k_obs[:, 2]) / 2
            cy_k = (k_obs[:, 1] + k_obs[:, 3]) / 2
            dx = cx_d[None, :] - cx_k[:, None]
            dy = cy_d[None, :] - cy_k[:, None]
            norm = np.sqrt(dx**2 + dy**2) + 1e-6
            X, Y = dx / norm, dy / norm  # (T, D)
            cosang = np.clip(velocities[:, 1:2] * X + velocities[:, 0:1] * Y, -1, 1)
            diff = (np.pi / 2 - np.abs(np.arccos(cosang))) / np.pi
            valid = (k_obs[:, 4] >= 0)[:, None]
            angle_cost = (valid * diff).T * self.inertia * confs[confs > self.det_thresh][:, None]

            a = (iou > self.thr).astype(int)
            if a.sum(1).max() == 1 and a.sum(0).max() == 1:
                pairs = np.stack(np.where(a), axis=1)
            else:
                mr, mc = linear_sum_assignment(-(iou + angle_cost))
                pairs = np.stack([mr, mc], axis=1)
            for d_i, t_i in pairs:
                if iou[d_i, t_i] < self.thr:
                    continue
                self.tracks[t_i].update(d_first[d_i, :5], d_first[d_i, 5], d_first[d_i, 6])
                matched_trk[t_i] = True
                matched_det[d_i] = True

        # OCR pass
        u_dets = np.where(~matched_det)[0]
        u_trks = np.where(~matched_trk)[0]
        if len(u_dets) and len(u_trks):
            iou_left = iou_batch(d_first[u_dets, :4], last_boxes[u_trks, :4])
            if iou_left.max() > self.thr:
                mr, mc = linear_sum_assignment(-iou_left)
                for a_i, b_i in zip(mr, mc):
                    if iou_left[a_i, b_i] < self.thr:
                        continue
                    d_i, t_i = u_dets[a_i], u_trks[b_i]
                    self.tracks[t_i].update(d_first[d_i, :5], d_first[d_i, 5], d_first[d_i, 6])
                    matched_trk[t_i] = True
                    matched_det[d_i] = True

        for t_i in np.where(~matched_trk)[0]:
            self.tracks[t_i].update(None, None, None)

        for d_i in np.where(~matched_det)[0]:
            self.tracks.append(
                _Track(d_first[d_i, :5], d_first[d_i, 5], d_first[d_i, 6], self.delta_t, self.q_xy, self.q_s)
            )

        rows = []
        keep = []
        for t in self.tracks:
            if t.last_obs.sum() < 0:
                d = xysr2xyxy(t.kf.x)
            else:
                d = t.last_obs[:4]
            if t.tsu < 1 and (t.hit_streak >= self.min_hits or self.frame <= self.min_hits):
                rows.append([*d, t.id + 1, t.conf, t.cls, t.det_ind])
            if t.tsu <= self.max_age:
                keep.append(t)
        self.tracks = keep
        return np.array(rows, float).reshape(-1, 8)
