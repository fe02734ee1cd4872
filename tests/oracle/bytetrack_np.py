"""Numpy oracle for ByteTrack association semantics.

Independent re-statement of the reference algorithm
(boxmot/trackers/bbox/bytetrack/bytetrack.py:17-447) in plain numpy,
float64, with exact lapjv-cost_limit assignment (scipy on the padded
matrix).  Used only to validate the jitted struct-of-arrays tracker.
"""

import numpy as np

from boxmot_tpu.ops.lap import linear_assignment_np
from tests.oracle.kalman_np import XYAHOracle

TRACKED, LOST, REMOVED = 1, 2, 3


def xyxy2xyah(b):
    w = b[2] - b[0]
    h = b[3] - b[1]
    return np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2, w / h, h])


def xyah2xyxy(m):
    cx, cy, a, h = m[:4]
    w = a * h
    return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


def iou(b1, b2):
    xx1 = max(b1[0], b2[0])
    yy1 = max(b1[1], b2[1])
    xx2 = min(b1[2], b2[2])
    yy2 = min(b1[3], b2[3])
    wh = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    return wh / max(a1 + a2 - wh, 1e-12)


class _Track:
    def __init__(self, det, kf):
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
        self.tracklet_len = 0

    @property
    def xyxy(self):
        if self.mean is None:
            return self.box
        return xyah2xyxy(self.mean)

    def activate(self, frame, tid):
        self.tid = tid
        self.mean, self.cov = self.kf.initiate(xyxy2xyah(self.box))
        self.tracklet_len = 0
        self.state = TRACKED
        self.activated = frame == 1
        self.frame_id = frame
        self.start_frame = frame

    def update_with(self, det_track, frame, reactivate):
        self.mean, self.cov = self.kf.update(
            self.mean, self.cov, xyxy2xyah(det_track.box)
        )
        self.tracklet_len = 0 if reactivate else self.tracklet_len + 1
        self.state = TRACKED
        self.activated = True
        self.frame_id = frame
        self.conf = det_track.conf
        self.cls = det_track.cls
        self.det_ind = det_track.det_ind


class ByteTrackOracle:
    def __init__(
        self,
        min_conf=0.1,
        track_thresh=0.45,
        match_thresh=0.8,
        track_buffer=25,
        frame_rate=30,
    ):
        self.min_conf = min_conf
        self.track_thresh = track_thresh
        self.match_thresh = match_thresh
        self.det_thresh = track_thresh
        self.max_time_lost = int(frame_rate / 30.0 * track_buffer)
        self.kf = XYAHOracle()
        self.frame = 0
        self.next_id = 1
        self.active = []  # tracked-state tracks (incl. unconfirmed)
        self.lost = []

    def _cost(self, tracks, dets, fuse):
        if not tracks or not dets:
            return np.zeros((len(tracks), len(dets)))
        tb = np.stack([t.xyxy for t in tracks])
        db = np.stack([d.box for d in dets])
        xx1 = np.maximum(tb[:, None, 0], db[None, :, 0])
        yy1 = np.maximum(tb[:, None, 1], db[None, :, 1])
        xx2 = np.minimum(tb[:, None, 2], db[None, :, 2])
        yy2 = np.minimum(tb[:, None, 3], db[None, :, 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        ta = ((tb[:, 2] - tb[:, 0]) * (tb[:, 3] - tb[:, 1]))[:, None]
        da = ((db[:, 2] - db[:, 0]) * (db[:, 3] - db[:, 1]))[None, :]
        sim = inter / np.maximum(ta + da - inter, 1e-12)
        if fuse:
            sim = sim * np.array([d.conf for d in dets])[None, :]
        return 1.0 - sim

    def update(self, dets):
        dets = np.asarray(dets, dtype=float)
        if dets.size == 0:
            dets = np.zeros((0, 6))
        dets = np.hstack([dets, np.arange(len(dets), dtype=float).reshape(-1, 1)])
        self.frame += 1
        conf = dets[:, 4] if len(dets) else np.zeros(0)
        d_first = [ _Track(d, self.kf) for d in dets[conf > self.track_thresh] ]
        second_sel = (conf > self.min_conf) & (conf < self.track_thresh)
        d_second = [ _Track(d, self.kf) for d in dets[second_sel] ]

        unconfirmed = [t for t in self.active if not t.activated]
        tracked = [t for t in self.active if t.activated]
        pool = tracked + [t for t in self.lost if t not in tracked]

        # KF predict with height-velocity zeroed for lost tracks
        for t in pool:
            if t.state != TRACKED:
                t.mean[7] = 0.0
            t.mean, t.cov = self.kf.predict(t.mean, t.cov)

        activated, refind, lost_now, removed = [], [], [], []

        matches, u_trk, u_det = linear_assignment_np(
            self._cost(pool, d_first, fuse=True), self.match_thresh
        )
        for it, idet in matches:
            t = pool[it]
            reactivate = t.state != TRACKED
            t.update_with(d_first[idet], self.frame, reactivate)
            (refind if reactivate else activated).append(t)

        r_tracked = [pool[i] for i in u_trk if pool[i].state == TRACKED]
        matches, u_trk2, _ = linear_assignment_np(
            self._cost(r_tracked, d_second, fuse=False), 0.5
        )
        for it, idet in matches:
            t = r_tracked[it]
            reactivate = t.state != TRACKED
            t.update_with(d_second[idet], self.frame, reactivate)
            (refind if reactivate else activated).append(t)
        for it in u_trk2:
            t = r_tracked[it]
            if t.state != LOST:
                t.state = LOST
                lost_now.append(t)

        d_left = [d_first[i] for i in u_det]
        matches, u_unc, u_det2 = linear_assignment_np(
            self._cost(unconfirmed, d_left, fuse=True), 0.7
        )
        for it, idet in matches:
            unconfirmed[it].update_with(d_left[idet], self.frame, False)
            activated.append(unconfirmed[it])
        for it in u_unc:
            unconfirmed[it].state = REMOVED
            removed.append(unconfirmed[it])

        for inew in u_det2:
            t = d_left[inew]
            if t.conf < self.det_thresh:
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

        # duplicate removal
        dup_a, dup_b = set(), set()
        for p, ta in enumerate(self.active):
            for q, tb in enumerate(self.lost):
                if 1 - iou(ta.xyxy, tb.xyxy) < 0.15:
                    timep = ta.frame_id - ta.start_frame
                    timeq = tb.frame_id - tb.start_frame
                    if timep > timeq:
                        dup_b.add(q)
                    else:
                        dup_a.add(p)
        self.active = [t for i, t in enumerate(self.active) if i not in dup_a]
        self.lost = [t for i, t in enumerate(self.lost) if i not in dup_b]

        rows = []
        for t in self.active:
            if t.activated:
                rows.append([*t.xyxy, t.tid, t.conf, t.cls, t.det_ind])
        return np.array(rows, dtype=np.float64).reshape(-1, 8)
