"""SFSORT as a fixed-capacity struct-of-arrays XLA program.

Re-design of the reference SFSORT (boxmot/trackers/bbox/sfsort/
sfsort.py:18-630): a Kalman-free tracker whose state is just the last
matched box.  Association uses the BBSI cost — DIoU with L1 diagonals
plus width/height similarity terms, cost = 1 - (diou + sh + sw)/3 —
for high-confidence detections, and plain IoU for the intermediate
pass.  Lost tracks split into Central/Marginal by frame margins with
separate timeouts.

Reference quirks preserved:
  * the AABB cost computes "h_intersection" along x and "w_intersection"
    along y (sfsort.py:558-590) — replicated verbatim;
  * frames with no high-confidence detections drop every unmatched
    track entirely when intermediate detections exist (sfsort.py:352-361);
  * default timeouts of 0 purge lost tracks immediately;
  * output ids start at 0 and every active track is emitted (no
    min-hits warm-up).

OBB mode (sfsort.py:484-552): boxes are (cx, cy, w, h, theta); the BBSI
cost uses rotated IoU, min/max width/height ratios for sw/sh, and the
AABB hulls of the rotated corners for the outer diagonal.  Matched
updates first resolve the 4-way OBB parameterization ambiguity against
the track state (the same alignment the OBB Kalman layouts use), then
smooth the angle with a damped theta-velocity
(sfsort.py:130-144: tv = d*tv + (1-d)*delta, theta += tv).
"""

from __future__ import annotations

import dataclasses
from functools import partial

from boxmot_tpu.ops.precision import tracker_jit

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from boxmot_tpu.motion.kalman import align_obb_to_ref
from boxmot_tpu.ops.geometry import obb_corners, wrap_angle
from boxmot_tpu.ops.iou import iou_batch_obb
from boxmot_tpu.ops.lap import masked_assignment
from boxmot_tpu.trackers.base import BaseTracker

EMPTY, ACTIVE, LOST_CENTRAL, LOST_MARGINAL = 3, 0, 1, 2


@dataclasses.dataclass(frozen=True)
class SFSortConfig:
    high_th: float = 0.6
    match_th_first: float = 0.67
    new_track_th: float = 0.7
    low_th: float = 0.1
    match_th_second: float = 0.3
    dynamic_tuning: bool = False
    cth: float = 0.5
    high_th_m: float = 0.0
    new_track_th_m: float = 0.0
    match_th_first_m: float = 0.0
    marginal_timeout: int = 0
    central_timeout: int = 0
    is_obb: bool = False
    obb_theta_damping: float = 0.8
    capacity: int = 256


@struct.dataclass
class SFSortState:
    bbox: jax.Array  # (K, 4) last matched box, (K, 5) xywha in OBB mode
    theta_vel: jax.Array  # (K,) damped angle velocity (OBB; zeros for AABB)
    status: jax.Array  # (K,)
    tid: jax.Array
    conf: jax.Array
    cls: jax.Array
    det_ind: jax.Array
    last_frame: jax.Array  # (K,)
    frame_count: jax.Array
    next_id: jax.Array
    margins: jax.Array  # (4,) l, r, t, b


def init_state(cfg: SFSortConfig, margins=None) -> SFSortState:
    K = cfg.capacity
    if margins is None:
        margins = jnp.asarray([0.0, 1e9, 0.0, 1e9], jnp.float32)
    B = 5 if cfg.is_obb else 4
    bbox = jnp.zeros((K, B), jnp.float32)
    if cfg.is_obb:
        bbox = bbox.at[:, 2:4].set(1.0)  # unit boxes: rotated IoU stays finite
    return SFSortState(
        bbox=bbox,
        theta_vel=jnp.zeros((K,), jnp.float32),
        status=jnp.full((K,), EMPTY, jnp.int32),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        last_frame=jnp.zeros((K,), jnp.int32),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(0, jnp.int32),
        margins=jnp.asarray(margins, jnp.float32),
    )


def bbsi_cost(trk, det):
    """BBSI cost between (K, 4) track boxes and (D, 4) det boxes,
    replicating the reference math verbatim (sfsort.py:553-630),
    including the swapped w/h naming."""
    eps = 1e-7
    b1_x1, b1_y1, b1_x2, b1_y2 = trk[:, 0:1], trk[:, 1:2], trk[:, 2:3], trk[:, 3:4]
    b2_x1, b2_y1, b2_x2, b2_y2 = det[:, 0], det[:, 1], det[:, 2], det[:, 3]

    h_inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
    w_inter = jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0)
    inter = h_inter * w_inter

    box1_h = b1_x2 - b1_x1  # (reference naming: "height" along x)
    box2_h = b2_x2 - b2_x1
    box1_w = b1_y2 - b1_y1
    box2_w = b2_y2 - b2_y1
    union = box2_h * box2_w + box1_h * box1_w - inter + eps
    iou = inter / union

    cx1 = (b1_x1 + b1_x2) / 2.0
    cy1 = (b1_y1 + b1_y2) / 2.0
    cx2 = (b2_x1 + b2_x2) / 2.0
    cy2 = (b2_y1 + b2_y2) / 2.0
    dw = jnp.abs(box2_w - box1_w)
    sw = w_inter / jnp.abs(w_inter + dw + eps)
    dh = jnp.abs(box2_h - box1_h)
    sh = h_inter / jnp.abs(h_inter + dh + eps)

    inner = jnp.abs(cx1 - cx2) + jnp.abs(cy1 - cy2)
    xxc1 = jnp.minimum(b1_x1, b2_x1)
    yyc1 = jnp.minimum(b1_y1, b2_y1)
    xxc2 = jnp.maximum(b1_x2, b2_x2)
    yyc2 = jnp.maximum(b1_y2, b2_y2)
    outer = jnp.maximum(jnp.abs(xxc2 - xxc1) + jnp.abs(yyc2 - yyc1), eps)
    diou = iou - inner / outer
    return 1.0 - (diou + sh + sw) / 3.0


def _obb_hull(boxes):
    """AABB hull [x1,y1,x2,y2] of rotated boxes (sfsort.py:485-492)."""
    corners = obb_corners(boxes)  # (K, 4, 2)
    lo = corners.min(axis=-2)
    hi = corners.max(axis=-2)
    return jnp.concatenate([lo, hi], axis=-1)


def bbsi_cost_obb(trk, det):
    """OBB BBSI cost (sfsort.py:514-552): rotated IoU, min/max w-h ratio
    similarity terms, and L1 diagonals over the corner AABB hulls."""
    eps = 1e-7
    iou = iou_batch_obb(trk, det)
    sw = jnp.minimum(trk[:, None, 2], det[None, :, 2]) / (
        jnp.maximum(trk[:, None, 2], det[None, :, 2]) + eps
    )
    sh = jnp.minimum(trk[:, None, 3], det[None, :, 3]) / (
        jnp.maximum(trk[:, None, 3], det[None, :, 3]) + eps
    )
    inner = jnp.abs(trk[:, None, 0] - det[None, :, 0]) + jnp.abs(
        trk[:, None, 1] - det[None, :, 1]
    )
    t_hull = _obb_hull(trk)
    d_hull = _obb_hull(det)
    xxc1 = jnp.minimum(t_hull[:, None, 0], d_hull[None, :, 0])
    yyc1 = jnp.minimum(t_hull[:, None, 1], d_hull[None, :, 1])
    xxc2 = jnp.maximum(t_hull[:, None, 2], d_hull[None, :, 2])
    yyc2 = jnp.maximum(t_hull[:, None, 3], d_hull[None, :, 3])
    outer = jnp.maximum(jnp.abs(xxc2 - xxc1) + jnp.abs(yyc2 - yyc1), eps)
    diou = iou - inner / outer
    return 1.0 - (diou + sh + sw) / 3.0


def iou_cost(trk, det):
    eps = 1e-7
    xx1 = jnp.maximum(trk[:, None, 0], det[None, :, 0])
    yy1 = jnp.maximum(trk[:, None, 1], det[None, :, 1])
    xx2 = jnp.minimum(trk[:, None, 2], det[None, :, 2])
    yy2 = jnp.minimum(trk[:, None, 3], det[None, :, 3])
    inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
    a1 = (trk[:, 2] - trk[:, 0]) * (trk[:, 3] - trk[:, 1])
    a2 = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
    return 1.0 - inter / (a1[:, None] + a2[None, :] - inter + eps)


@partial(tracker_jit, static_argnames=("cfg",))
def sfsort_step(cfg: SFSortConfig, state: SFSortState, dets, det_valid):
    K = cfg.capacity
    D = dets.shape[0]
    B = 5 if cfg.is_obb else 4
    frame = state.frame_count + 1
    conf = dets[:, B]
    det_box = dets[:, :B]

    # dynamic thresholds (sfsort.py:395-407)
    if cfg.dynamic_tuning:
        count = jnp.maximum(jnp.sum((conf > cfg.cth) & det_valid), 1)
        lnc = jnp.log10(count.astype(jnp.float32))
        hth = jnp.clip(cfg.high_th - cfg.high_th_m * lnc, 0.0, 1.0)
        nth = jnp.clip(cfg.new_track_th + cfg.new_track_th_m * lnc, hth, 1.0)
        mth = jnp.clip(cfg.match_th_first - cfg.match_th_first_m * lnc, 0.0, 0.67)
    else:
        hth = jnp.asarray(cfg.high_th, jnp.float32)
        nth = jnp.asarray(cfg.new_track_th, jnp.float32)
        mth = jnp.asarray(cfg.match_th_first, jnp.float32)

    # purge stale lost tracks (sfsort.py:409-416)
    age = frame - state.last_frame
    status = state.status
    status = jnp.where(
        (status == LOST_CENTRAL) & (age > cfg.central_timeout), EMPTY, status
    )
    status = jnp.where(
        (status == LOST_MARGINAL) & (age > cfg.marginal_timeout), EMPTY, status
    )

    pool = status != EMPTY
    high = det_valid & (conf > hth)
    inter = det_valid & (conf > cfg.low_th) & (conf < hth)
    any_high = jnp.any(high)
    any_inter = jnp.any(inter)

    # pass 1: BBSI cost, cost_limit = mth
    if cfg.is_obb:
        cost1 = bbsi_cost_obb(state.bbox, det_box)
    else:
        cost1 = bbsi_cost(state.bbox, det_box)
    r2c1 = masked_assignment(cost1, pool, high, mth)
    m1 = (r2c1 >= 0) & any_high
    dm1 = jnp.zeros((D,), bool).at[jnp.where(m1, r2c1, D)].set(True, mode="drop")

    # pass 2: intermediate dets vs pass-1 unmatched pool, IoU only —
    # only runs when there were high detections (len(unmatched_tracks))
    u_pool = pool & ~m1
    if cfg.is_obb:
        cost2 = 1.0 - iou_batch_obb(state.bbox, det_box)
    else:
        cost2 = iou_cost(state.bbox, det_box)
    r2c2 = masked_assignment(cost2, u_pool, inter, cfg.match_th_second)
    m2 = (r2c2 >= 0) & any_high & any_inter

    matched = m1 | m2
    det_col = jnp.clip(jnp.where(m1, r2c1, r2c2), 0, D - 1)

    meas = det_box[det_col]
    theta_vel = state.theta_vel
    if cfg.is_obb:
        # Align the 4-way OBB parameterization to the track, then smooth
        # the angle with a damped velocity (sfsort.py:69-144).
        aligned = align_obb_to_ref(meas, state.bbox)
        prev_theta = state.bbox[:, 4]
        delta = wrap_angle(aligned[:, 4] - prev_theta)
        d = cfg.obb_theta_damping
        new_tv = d * theta_vel + (1.0 - d) * delta
        theta_vel = jnp.where(matched, new_tv, theta_vel)
        meas = aligned.at[:, 4].set(wrap_angle(prev_theta + new_tv))
    bbox = jnp.where(matched[:, None], meas, state.bbox)
    conf_s = jnp.where(matched, conf[det_col], state.conf)
    cls_s = jnp.where(matched, dets[:, B + 1][det_col], state.cls)
    det_ind_s = jnp.where(matched, dets[:, B + 2][det_col], state.det_ind)
    last_frame = jnp.where(matched, frame, state.last_frame)
    status = jnp.where(matched, ACTIVE, status)

    # unmatched pool -> lost with central/marginal split (sfsort.py:417-427)
    # active this frame means matched; everything else in the pool goes
    # lost — or is dropped entirely when no association ran at all.
    was_active_unmatched = pool & ~matched
    if cfg.is_obb:
        u, v = bbox[:, 0], bbox[:, 1]  # xywha center (sfsort.py:420-421)
    else:
        u = (bbox[:, 0] + bbox[:, 2]) / 2.0
        v = (bbox[:, 1] + bbox[:, 3]) / 2.0
    l, r, t, b = state.margins[0], state.margins[1], state.margins[2], state.margins[3]
    central = (l < u) & (u < r) & (t < v) & (v < b)
    lost_state = jnp.where(central, LOST_CENTRAL, LOST_MARGINAL)
    # next_lost comes from pass-1 unmatched tracks when any high det
    # existed, or the whole pool when the frame had no usable dets;
    # otherwise (only intermediate dets) unmatched tracks are dropped.
    goes_lost = jnp.where(
        any_high,
        was_active_unmatched,
        was_active_unmatched & ~any_inter,
    )
    already_lost = (status == LOST_CENTRAL) | (status == LOST_MARGINAL)
    status = jnp.where(goes_lost & ~already_lost, lost_state, status)
    status = jnp.where(was_active_unmatched & ~goes_lost & (status == ACTIVE), EMPTY, status)

    # new tracks from unmatched high dets above nth
    new_det = high & ~dm1 & (conf > nth)
    n_new = jnp.sum(new_det.astype(jnp.int32))
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1
    det_by_rank = (
        jnp.full((D,), D, jnp.int32)
        .at[jnp.where(new_det, det_rank, D)]
        .set(jnp.arange(D, dtype=jnp.int32), mode="drop")
    )
    free = status == EMPTY
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    takes = free & (free_rank < n_new)
    slot_det = jnp.clip(det_by_rank[jnp.clip(free_rank, 0, D - 1)], 0, D - 1)
    bbox = jnp.where(takes[:, None], det_box[slot_det], bbox)
    status = jnp.where(takes, ACTIVE, status)
    tid = jnp.where(takes, state.next_id + free_rank, state.tid)
    conf_s = jnp.where(takes, conf[slot_det], conf_s)
    cls_s = jnp.where(takes, dets[:, B + 1][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, B + 2][slot_det], det_ind_s)
    last_frame = jnp.where(takes, frame, last_frame)
    theta_vel = jnp.where(takes, 0.0, theta_vel)

    out_mask = (status == ACTIVE) & (last_frame == frame)
    out = jnp.concatenate(
        [
            bbox,
            tid[:, None].astype(jnp.float32),
            conf_s[:, None],
            cls_s[:, None],
            det_ind_s[:, None],
        ],
        axis=1,
    )
    # tracks that stay ACTIVE but weren't matched this frame don't exist
    # in the reference (active list is rebuilt per frame) — they were
    # handled by goes_lost / drop above, so ACTIVE == matched-or-new.

    new_state = SFSortState(
        bbox=bbox,
        theta_vel=theta_vel,
        status=status,
        tid=tid,
        conf=conf_s,
        cls=cls_s,
        det_ind=det_ind_s,
        last_frame=last_frame,
        frame_count=frame,
        next_id=state.next_id + n_new,
        margins=state.margins,
    )
    return new_state, out, out_mask


class SFSORT(BaseTracker):
    """Host wrapper mirroring the reference constructor (sfsort.py:197-258)."""

    supports_obb = True

    def __init__(
        self,
        high_th: float = 0.6,
        match_th_first: float = 0.67,
        new_track_th: float = 0.7,
        low_th: float = 0.1,
        match_th_second: float = 0.3,
        dynamic_tuning: bool = False,
        cth: float = 0.5,
        high_th_m: float = 0.0,
        new_track_th_m: float = 0.0,
        match_th_first_m: float = 0.0,
        marginal_timeout: int = 0,
        central_timeout: int = 0,
        obb_theta_damping: float = 0.8,
        frame_width=None,
        frame_height=None,
        horizontal_margin=None,
        vertical_margin=None,
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        clamp = lambda v, lo, hi: max(lo, min(v, hi))
        high_th = clamp(high_th, 0.0, 1.0)
        self.cfg = SFSortConfig(
            high_th=high_th,
            match_th_first=clamp(match_th_first, 0.0, 0.67),
            new_track_th=clamp(new_track_th, high_th, 1.0),
            low_th=clamp(low_th, 0.0, high_th),
            match_th_second=clamp(match_th_second, 0.0, 1.0),
            dynamic_tuning=dynamic_tuning,
            cth=clamp(cth, low_th, 1.0),
            high_th_m=high_th_m if not dynamic_tuning else clamp(high_th_m, 0.02, 0.1),
            new_track_th_m=new_track_th_m
            if not dynamic_tuning
            else clamp(new_track_th_m, 0.02, 0.08),
            match_th_first_m=match_th_first_m
            if not dynamic_tuning
            else clamp(match_th_first_m, 0.02, 0.08),
            marginal_timeout=int(clamp(marginal_timeout, 0, 500)),
            central_timeout=int(clamp(central_timeout, 0, 1000)),
            is_obb=self.is_obb,
            obb_theta_damping=clamp(obb_theta_damping, 0.0, 1.0),
            capacity=capacity,
        )
        self._margin_cfg = (frame_width, frame_height, horizontal_margin, vertical_margin)

    def _set_detection_mode(self, is_obb: bool):
        super()._set_detection_mode(is_obb)
        self.cfg = dataclasses.replace(self.cfg, is_obb=is_obb)

    def _margins(self):
        fw, fh, hm, vm = self._margin_cfg
        fw = fw if fw is not None else self.w
        fh = fh if fh is not None else self.h
        if fw is None or fh is None:
            return np.array([0.0, 1e9, 0.0, 1e9], np.float32)
        l, r = 0.0, float(fw)
        t, b = 0.0, float(fh)
        if hm is not None:
            l = float(np.clip(hm, 0, fw))
            r = float(np.clip(fw - hm, 0, fw))
        if vm is not None:
            t = float(np.clip(vm, 0, fh))
            b = float(np.clip(fh - vm, 0, fh))
        return np.array([l, r, t, b], np.float32)

    def _init_state(self):
        return init_state(self.cfg, margins=self._margins())

    def _lost_mask(self, state):
        # central + marginal lost slots (show_kf_preds overlays)
        st = np.asarray(state.status)
        return (st == LOST_CENTRAL) | (st == LOST_MARGINAL)

    def _step(self, state, dets_padded, det_valid):
        return sfsort_step(self.cfg, state, dets_padded, det_valid)
