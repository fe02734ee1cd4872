"""Numpy oracle for BotSort association semantics
(reference botsort.py:139-500 + botsort_track.py:12-325), without CMC."""

import numpy as np

from boxmot_tpu.ops.lap import linear_assignment_np

TRACKED, LOST, REMOVED = 1, 2, 3
SWP, SWV = 1.0 / 20, 1.0 / 160


class XYWHOracle:
    """XYWH constant-velocity KF (motion/kalman_filters/xywh.py:8-120)."""

    def __init__(self):
        self.F = np.eye(8)
        for i in range(4):
            self.F[i, 4 + i] = 1.0

    def initiate(self, z):
        mean = np.r_[z, np.zeros(4)]
        std = [
            2 * SWP * z[2], 2 * SWP * z[3], 2 * SWP * z[2], 2 * SWP * z[3],
            10 * SWV * z[2], 10 * SWV * z[3], 10 * SWV * z[2], 10 * SWV * z[3],
        ]
        mean[2] = max(mean[2], 1e-4)
        mean[3] = max(mean[3], 1e-4)
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        w, h = mean[2], mean[3]
        std = [SWP * w, SWP * h, SWP * w, SWP * h, SWV * w, SWV * h, SWV * w, SWV * h]
        mean = self.F @ mean
        cov = self.F @ cov @ self.F.T + np.diag(np.square(std))
        mean[2] = max(mean[2], 1e-4)
        mean[3] = max(mean[3], 1e-4)
        return mean, cov

    def update(self, mean, cov, z):
        w, h = mean[2], mean[3]
        std = np.array([SWP * w, SWP * h, SWP * w, SWP * h])
        R = np.diag(np.square(std))
        H = np.eye(4, 8)
        S = H @ cov @ H.T + R
        K = cov @ H.T @ np.linalg.inv(S)
        mean = mean + K @ (z - H @ mean)
        cov = cov - K @ S @ K.T
        mean[2] = max(mean[2], 1e-4)
        mean[3] = max(mean[3], 1e-4)
        return mean, cov


def xyxy2xywh(b):
    return np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2, b[2] - b[0], b[3] - b[1]])


def xywh2xyxy(m):
    cx, cy, w, h = m[:4]
    return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


def iou_mat(tb, db):
    if len(tb) == 0 or len(db) == 0:
        return np.zeros((len(tb), len(db)))
    tb = np.asarray(tb)[:, None]
    db = np.asarray(db)[None, :]
    xx1 = np.maximum(tb[..., 0], db[..., 0])
    yy1 = np.maximum(tb[..., 1], db[..., 1])
    xx2 = np.minimum(tb[..., 2], db[..., 2])
    yy2 = np.minimum(tb[..., 3], db[..., 3])
    inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
    a = (tb[..., 2] - tb[..., 0]) * (tb[..., 3] - tb[..., 1])
    b = (db[..., 2] - db[..., 0]) * (db[..., 3] - db[..., 1])
    return inter / np.maximum(a + b - inter, 1e-12)


class _Track:
    def __init__(self, det, feat, kf):
        self.box = det[:4].astype(float)
        self.conf = float(det[4])
        self.cls = float(det[5])
        self.det_ind = float(det[6])
        self.kf = kf
        self.mean = None
        self.cov = None
        self.state = TRACKED
        self.activated = False
        self.tid = 0
        self.frame_id = 0
        self.start_frame = 0
        self.smooth = None
        self.curr = None
        self.cls_hist = []
        if feat is not None:
            self.update_features(feat)
        self.update_cls(self.cls, self.conf)

    def update_features(self, feat):
        feat = feat / np.linalg.norm(feat)
        self.curr = feat
        if self.smooth is None:
            self.smooth = feat
        else:
            self.smooth = 0.9 * self.smooth + 0.1 * feat
        self.smooth = self.smooth / np.linalg.norm(self.smooth)

    def update_cls(self, cls, conf):
        max_freq = 0
        found = False
        for c in self.cls_hist:
            if cls == c[0]:
                c[1] += conf
                found = True
            if c[1] > max_freq:
                max_freq = c[1]
                self.cls = c[0]
        if not found:
            self.cls_hist.append([cls, conf])
            self.cls = cls

    @property
    def xyxy(self):
        if self.mean is None:
            return self.box
        return xywh2xyxy(self.mean)

    def activate(self, frame, tid):
        self.tid = tid
        self.mean, self.cov = self.kf.initiate(xyxy2xywh(self.box))
        self.state = TRACKED
        self.activated = frame == 1
        self.frame_id = frame
        self.start_frame = frame

    def update_with(self, d, frame):
        self.mean, self.cov = self.kf.update(self.mean, self.cov, xyxy2xywh(d.box))
        if d.curr is not None:
            self.update_features(d.curr)
        self.state = TRACKED
        self.activated = True
        self.frame_id = frame
        self.conf = d.conf
        self.cls = d.cls
        self.det_ind = d.det_ind
        self.update_cls(d.cls, d.conf)


class BotSortOracle:
    def __init__(
        self,
        track_high_thresh=0.5,
        track_low_thresh=0.1,
        new_track_thresh=0.6,
        match_thresh=0.8,
        proximity_thresh=0.5,
        appearance_thresh=0.25,
        second_match_thresh=0.5,
        unconfirmed_match_thresh=0.7,
        unconfirmed_emb_scale=2.0,
        track_buffer=30,
        with_reid=True,
        fuse_first_associate=False,
    ):
        self.p = dict(locals())
        self.p.pop("self")
        self.kf = XYWHOracle()
        self.max_time_lost = track_buffer
        self.frame = 0
        self.next_id = 1
        self.active = []
        self.lost = []

    def _emb_dist(self, tracks, dets):
        E = np.ones((len(tracks), len(dets)))
        for i, t in enumerate(tracks):
            if t.smooth is None:
                continue
            for j, d in enumerate(dets):
                if d.curr is None:
                    continue
                E[i, j] = max(0.0, 1.0 - float(t.smooth @ d.curr))
        return E

    def update(self, dets, embs=None):
        p = self.p
        self.frame += 1
        dets = np.asarray(dets, float)
        if dets.size == 0:
            dets = np.zeros((0, 6))
        dets = np.hstack([dets, np.arange(len(dets), dtype=float).reshape(-1, 1)])
        confs = dets[:, 4]
        fm = confs > p["track_high_thresh"]
        sm = (confs > p["track_low_thresh"]) & (confs < p["track_high_thresh"])
        d_first = [
            _Track(d, embs[i] if (embs is not None and p["with_reid"]) else None, self.kf)
            for i, d in zip(np.where(fm)[0], dets[fm])
        ]
        d_second = [_Track(d, None, self.kf) for d in dets[sm]]

        unconfirmed = [t for t in self.active if not t.activated]
        tracked = [t for t in self.active if t.activated]
        pool = tracked + [t for t in self.lost if t not in tracked]
        for t in pool:
            if t.state != TRACKED:
                t.mean[6:8] = 0.0
            t.mean, t.cov = self.kf.predict(t.mean, t.cov)

        activated, refind, lost_now, removed = [], [], [], []

        tb = [t.xyxy for t in pool]
        db = [d.box for d in d_first]
        iou = iou_mat(tb, db)
        iou_dist = 1 - iou
        prox = iou_dist > p["proximity_thresh"]
        c_iou = iou_dist.copy()
        if p["fuse_first_associate"]:
            c_iou = 1 - iou * np.array([d.conf for d in d_first])[None, :] if len(d_first) else c_iou
        if p["with_reid"] and len(pool) and len(d_first):
            emb = self._emb_dist(pool, d_first)
            emb[emb > p["appearance_thresh"]] = 1.0
            emb[prox] = 1.0
            cost = np.minimum(c_iou, emb)
        else:
            cost = c_iou
        matches, u_trk, u_det = linear_assignment_np(cost, p["match_thresh"])
        for it, idet in matches:
            t = pool[it]
            react = t.state != TRACKED
            t.update_with(d_first[idet], self.frame)
            (refind if react else activated).append(t)

        r_tracked = [pool[i] for i in u_trk if pool[i].state == TRACKED]
        iou2 = 1 - iou_mat([t.xyxy for t in r_tracked], [d.box for d in d_second])
        matches2, u_trk2, _ = linear_assignment_np(iou2, p["second_match_thresh"])
        for it, idet in matches2:
            t = r_tracked[it]
            react = t.state != TRACKED
            t.update_with(d_second[idet], self.frame)
            (refind if react else activated).append(t)
        for it in u_trk2:
            t = r_tracked[it]
            if t.state != LOST:
                t.state = LOST
                lost_now.append(t)

        d_left = [d_first[i] for i in u_det]
        iou3 = iou_mat([t.xyxy for t in unconfirmed], [d.box for d in d_left])
        iou3_dist = 1 - iou3
        prox3 = iou3_dist > p["proximity_thresh"]
        c3 = 1 - iou3 * np.array([d.conf for d in d_left])[None, :] if len(d_left) else iou3_dist
        if p["with_reid"] and len(unconfirmed) and len(d_left):
            emb3 = self._emb_dist(unconfirmed, d_left) / p["unconfirmed_emb_scale"]
            emb3[emb3 > p["appearance_thresh"]] = 1.0
            emb3[prox3] = 1.0
            c3 = np.minimum(c3, emb3)
        matches3, u_unc, u_det3 = linear_assignment_np(c3, p["unconfirmed_match_thresh"])
        for it, idet in matches3:
            unconfirmed[it].update_with(d_left[idet], self.frame)
            activated.append(unconfirmed[it])
        for it in u_unc:
            unconfirmed[it].state = REMOVED
            removed.append(unconfirmed[it])

        for inew in u_det3:
            t = d_left[inew]
            if t.conf < p["new_track_thresh"]:
                continue
            t.activate(self.frame, self.next_id)
            self.next_id += 1
            activated.append(t)

        for t in self.lost:
            if self.frame - t.frame_id > self.max_time_lost:
                t.state = REMOVED
                removed.append(t)

        self.active = [t for t in self.active if t.state == TRACKED]
        for t in activated + refind:
            if t not in self.active:
                self.active.append(t)
        self.lost = [t for t in self.lost if t.state == LOST and t not in self.active]
        self.lost.extend(lost_now)
        self.lost = [t for t in self.lost if t not in removed]

        dup_a, dup_b = set(), set()
        for i, ta in enumerate(self.active):
            for j, tb_ in enumerate(self.lost):
                if 1 - iou_mat([ta.xyxy], [tb_.xyxy])[0, 0] < 0.15:
                    if ta.frame_id - ta.start_frame > tb_.frame_id - tb_.start_frame:
                        dup_b.add(j)
                    else:
                        dup_a.add(i)
        self.active = [t for i, t in enumerate(self.active) if i not in dup_a]
        self.lost = [t for j, t in enumerate(self.lost) if j not in dup_b]

        rows = [
            [*t.xyxy, t.tid, t.conf, t.cls, t.det_ind]
            for t in self.active
            if t.activated
        ]
        return np.array(rows, float).reshape(-1, 8)
