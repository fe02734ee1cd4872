"""ByteTrack as a fixed-capacity struct-of-arrays XLA program.

Re-design of the reference ByteTrack
(boxmot/trackers/bbox/bytetrack/bytetrack.py:17-447): instead of Python
lists of STrack objects, all track state lives in (K,) slot arrays on
device and one jitted `step` performs the entire per-frame pipeline —
batched KF predict, IoU cost, two-stage + unconfirmed auction assignment,
a single fused KF update for every matched slot, lifecycle transitions,
duplicate suppression and output emission — with no host round-trips.

Association semantics preserved from the reference:
  * pass 1: high-conf dets vs (activated-tracked + lost) pool,
    fuse_score cost, thresh = match_thresh        (bytetrack.py:304-324)
  * pass 2: low-conf dets vs pass-1-unmatched TRACKED slots, raw IoU,
    thresh = 0.5                                  (bytetrack.py:326-352)
  * unconfirmed pass: pass-1-leftover dets vs never-activated tracks,
    fuse_score, thresh = 0.7                      (bytetrack.py:354-372)
  * new tracks from remaining high-conf dets; activated immediately only
    on frame 1                                    (bytetrack.py:374-380, STrack.activate)
  * lost tracks dropped after max_time_lost = int(frame_rate/30*track_buffer)
  * duplicate removal between tracked and lost sets at IoU dist < 0.15,
    keeping the older track                       (bytetrack.py:434-447)

Slot states: 0 = empty, 1 = tracked, 2 = lost (removed slots are freed
immediately; the reference's removed list only feeds display code).
"""

from __future__ import annotations

import dataclasses
from functools import partial

from boxmot_tpu.ops.precision import tracker_jit

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from boxmot_tpu.motion import kalman
from boxmot_tpu.ops.geometry import xyah2xyxy, xyxy2xyah
from boxmot_tpu.ops.iou import iou_batch, iou_batch_obb
from boxmot_tpu.ops.lap import masked_assignment
from boxmot_tpu.trackers.base import BaseTracker

EMPTY, TRACKED, LOST = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class ByteTrackConfig:
    track_thresh: float = 0.45
    match_thresh: float = 0.8
    min_conf: float = 0.1
    det_thresh: float = 0.45  # reference sets det_thresh = track_thresh
    max_time_lost: int = 25
    is_obb: bool = False  # oriented boxes: XYWH-5 filter + rotated IoU
    # KF noise scales; override with tune-kf estimates (motion/calibration.py)
    std_weight_position: float = 1.0 / 20
    std_weight_velocity: float = 1.0 / 160
    capacity: int = 256


@struct.dataclass
class ByteTrackState:
    mean: jax.Array  # (K, 8) xyah + velocities
    cov: jax.Array  # (K, 8, 8)
    status: jax.Array  # (K,) int32: EMPTY/TRACKED/LOST
    activated: jax.Array  # (K,) bool
    tid: jax.Array  # (K,) int32 track id
    conf: jax.Array  # (K,) f32
    cls: jax.Array  # (K,) f32
    det_ind: jax.Array  # (K,) f32
    frame_id: jax.Array  # (K,) int32 last-update frame (end_frame)
    start_frame: jax.Array  # (K,) int32
    tracklet_len: jax.Array  # (K,) int32
    frame_count: jax.Array  # () int32
    next_id: jax.Array  # () int32


def init_state(cfg: ByteTrackConfig) -> ByteTrackState:
    K = cfg.capacity
    dx = 10 if cfg.is_obb else 8
    return ByteTrackState(
        mean=jnp.zeros((K, dx), jnp.float32),
        cov=jnp.zeros((K, dx, dx), jnp.float32),
        status=jnp.zeros((K,), jnp.int32),
        activated=jnp.zeros((K,), bool),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        frame_id=jnp.zeros((K,), jnp.int32),
        start_frame=jnp.zeros((K,), jnp.int32),
        tracklet_len=jnp.zeros((K,), jnp.int32),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
    )


def _scatter_det_flags(r2c, matched, n_dets):
    """Mark det columns taken by matched rows."""
    idx = jnp.where(matched, r2c, n_dets)
    return jnp.zeros((n_dets,), bool).at[idx].set(True, mode="drop")


@partial(tracker_jit, static_argnames=("cfg",))
def bytetrack_step(cfg: ByteTrackConfig, state: ByteTrackState, dets, det_valid):
    """One frame.  dets: (D, 7) [x1,y1,x2,y2,conf,cls,det_ind] padded;
    det_valid: (D,) — padding rows have conf = -1.
    Returns (state, out (K, 8), out_mask (K,))."""
    if cfg.is_obb:
        # OBB: (cx,cy,w,h,angle,conf,cls,det_ind) on the XYWH-5 filter
        # (reference STrack.shared_kalman_obb, bytetrack.py:18-19)
        layout = kalman.make_xywh_layout(
            obb=True,
            std_weight_position=cfg.std_weight_position,
            std_weight_velocity=cfg.std_weight_velocity,
        )
        conf_i, cls_i, ind_i = 5, 6, 7
    else:
        layout = kalman.make_xyah_layout(
            std_weight_position=cfg.std_weight_position,
            std_weight_velocity=cfg.std_weight_velocity,
        )
        conf_i, cls_i, ind_i = 4, 5, 6
    K = cfg.capacity
    D = dets.shape[0]
    frame = state.frame_count + 1

    conf = dets[:, conf_i]
    first = det_valid & (conf > cfg.track_thresh)
    second = det_valid & (conf > cfg.min_conf) & (conf < cfg.track_thresh)

    status0 = state.status
    tracked_act = (status0 == TRACKED) & state.activated
    unconf = (status0 == TRACKED) & ~state.activated
    lost = status0 == LOST
    pool = tracked_act | lost

    # --- KF predict over the pool (STrack.multi_predict, bytetrack.py:64-82):
    # lost tracks get their size/angle velocities zeroed first.
    if cfg.is_obb:
        mean = state.mean.at[:, 7:10].set(
            jnp.where(lost[:, None], 0.0, state.mean[:, 7:10])
        )
    else:
        mean = state.mean.at[:, 7].set(jnp.where(lost, 0.0, state.mean[:, 7]))
    pmean, pcov = kalman.predict(layout, mean, state.cov, pool)

    if cfg.is_obb:
        det_meas = dets[:, :5]
        # Shared rotated-IoU matrix over xywha boxes (iou_distance is_obb)
        iou = iou_batch_obb(pmean[:, :5], det_meas)
    else:
        det_xyxy = dets[:, :4]
        det_meas = xyxy2xyah(det_xyxy)
        trk_xyxy = xyah2xyxy(pmean[:, :4])
        # Shared IoU matrix: rows not updated between passes keep their
        # pre-update means, so one matrix serves all three association passes.
        iou = iou_batch(trk_xyxy, det_xyxy)  # (K, D)

    # --- pass 1: high-conf dets vs pool, fuse_score (matching.py:139-147)
    cost1 = 1.0 - iou * conf[None, :]
    r2c1 = masked_assignment(cost1, pool, first, cfg.match_thresh)
    m1 = r2c1 >= 0
    dm1 = _scatter_det_flags(r2c1, m1, D)

    # --- pass 2: low-conf dets vs unmatched TRACKED slots, plain IoU
    r_tracked = pool & ~m1 & (status0 == TRACKED)
    cost2 = 1.0 - iou
    r2c2 = masked_assignment(cost2, r_tracked, second, 0.5)
    m2 = r2c2 >= 0

    # --- unconfirmed pass: leftover high-conf dets vs unconfirmed tracks
    u_first = first & ~dm1
    r2c3 = masked_assignment(cost1, unconf, u_first, 0.7)
    m3 = r2c3 >= 0
    dm3 = _scatter_det_flags(r2c3, m3, D)

    # --- single fused KF update for every matched slot
    matched = m1 | m2 | m3
    det_col = jnp.where(m1, r2c1, jnp.where(m2, r2c2, r2c3))
    c = jnp.clip(det_col, 0, D - 1)
    meas = det_meas[c]
    if cfg.is_obb:
        # resolve the rotated-rect parameterization against the state
        # (KalmanFilterXYAH/XYWH OBB update, xywh.py:88-133)
        meas = kalman.align_obb_to_ref(meas, pmean[:, :5])
    new_mean, new_cov = kalman.update(
        layout, pmean, pcov, meas, jnp.zeros((K,), jnp.float32), matched
    )
    if cfg.is_obb:
        # angular velocity damped x0.8 after every observed update
        # (KalmanFilterXYWH.update, xywh.py:183-184)
        new_mean = new_mean.at[:, 9].set(
            jnp.where(matched, new_mean[:, 9] * 0.8, new_mean[:, 9])
        )

    # --- bookkeeping for matched slots
    was_tracked = status0 == TRACKED  # update() vs re_activate() split
    tracklet_len = jnp.where(
        matched, jnp.where(was_tracked, state.tracklet_len + 1, 0), state.tracklet_len
    )
    status = jnp.where(matched, TRACKED, status0)
    activated = state.activated | matched
    conf_s = jnp.where(matched, conf[c], state.conf)
    cls_s = jnp.where(matched, dets[:, cls_i][c], state.cls)
    det_ind_s = jnp.where(matched, dets[:, ind_i][c], state.det_ind)
    frame_id = jnp.where(matched, frame, state.frame_id)

    # --- drop aged-out lost tracks (checked before this frame's new lost,
    # mirroring the reference's use of the pre-extension lost list)
    aged = (status == LOST) & (frame - frame_id > cfg.max_time_lost)
    status = jnp.where(aged, EMPTY, status)

    # --- tracked slots unmatched in both passes become lost
    newly_lost = r_tracked & ~m2
    status = jnp.where(newly_lost, LOST, status)

    # --- unmatched unconfirmed tracks are removed
    status = jnp.where(unconf & ~m3, EMPTY, status)

    # --- new tracks from remaining high-conf dets
    new_det = u_first & ~dm3 & (conf >= cfg.det_thresh)
    n_new = jnp.sum(new_det.astype(jnp.int32))
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1  # rank among new dets
    det_by_rank = (
        jnp.full((D,), D, jnp.int32)
        .at[jnp.where(new_det, det_rank, D)]
        .set(jnp.arange(D, dtype=jnp.int32), mode="drop")
    )
    free = status == EMPTY
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    takes = free & (free_rank < n_new)
    slot_det = det_by_rank[jnp.clip(free_rank, 0, D - 1)]
    slot_det = jnp.clip(slot_det, 0, D - 1)

    init_meas = det_meas[slot_det]
    init_mean_v, init_cov_v = kalman.initiate(layout, init_meas)
    new_mean = jnp.where(takes[:, None], init_mean_v, new_mean)
    new_cov = jnp.where(takes[:, None, None], init_cov_v, new_cov)
    status = jnp.where(takes, TRACKED, status)
    activated = jnp.where(takes, frame == 1, activated)
    tid = jnp.where(takes, state.next_id + free_rank, state.tid)
    conf_s = jnp.where(takes, conf[slot_det], conf_s)
    cls_s = jnp.where(takes, dets[:, cls_i][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, ind_i][slot_det], det_ind_s)
    frame_id = jnp.where(takes, frame, frame_id)
    start_frame = jnp.where(takes, frame, state.start_frame)
    tracklet_len = jnp.where(takes, 0, tracklet_len)

    # --- duplicate suppression between tracked and lost sets
    # (remove_duplicate_stracks, bytetrack.py:434-447): pairs closer than
    # IoU distance 0.15 keep the longer-lived track.
    if cfg.is_obb:
        out_box = new_mean[:, :5]
        pair_iou = iou_batch_obb(out_box, out_box)
    else:
        out_box = xyah2xyxy(new_mean[:, :4])
        pair_iou = iou_batch(out_box, out_box)
    a_mask = status == TRACKED
    b_mask = status == LOST
    close = (1.0 - pair_iou) < 0.15
    pair = close & a_mask[:, None] & b_mask[None, :]
    time_a = (frame_id - start_frame)[:, None]
    time_b = (frame_id - start_frame)[None, :]
    dup_a = jnp.any(pair & (time_a <= time_b), axis=1)
    dup_b = jnp.any(pair & (time_a > time_b), axis=0)
    status = jnp.where(dup_a & a_mask, EMPTY, status)
    status = jnp.where(dup_b & b_mask, EMPTY, status)

    out_mask = (status == TRACKED) & activated
    out = jnp.concatenate(
        [
            out_box,
            tid[:, None].astype(jnp.float32),
            conf_s[:, None],
            cls_s[:, None],
            det_ind_s[:, None],
        ],
        axis=1,
    )

    new_state = ByteTrackState(
        mean=new_mean,
        cov=new_cov,
        status=status,
        activated=activated,
        tid=tid,
        conf=conf_s,
        cls=cls_s,
        det_ind=det_ind_s,
        frame_id=frame_id,
        start_frame=start_frame,
        tracklet_len=tracklet_len,
        frame_count=frame,
        next_id=state.next_id + n_new,
    )
    return new_state, out, out_mask


class ByteTrack(BaseTracker):
    """Host wrapper with the reference's constructor surface
    (bytetrack.py:199-257)."""

    supports_obb = True

    def __init__(
        self,
        min_conf: float = 0.1,
        track_thresh: float = 0.45,
        match_thresh: float = 0.8,
        track_buffer: int = 25,
        frame_rate: int = 30,
        std_weight_position: float = 1.0 / 20,
        std_weight_velocity: float = 1.0 / 160,
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.track_thresh = track_thresh
        self.match_thresh = match_thresh
        self.min_conf = min_conf
        self.det_thresh = track_thresh
        self.buffer_size = int(frame_rate / 30.0 * track_buffer)
        self.max_time_lost = self.buffer_size
        self.cfg = ByteTrackConfig(
            track_thresh=track_thresh,
            match_thresh=match_thresh,
            min_conf=min_conf,
            det_thresh=track_thresh,
            max_time_lost=self.max_time_lost,
            is_obb=self.is_obb,
            std_weight_position=std_weight_position,
            std_weight_velocity=std_weight_velocity,
            capacity=capacity,
        )

    def _set_detection_mode(self, is_obb: bool):
        super()._set_detection_mode(is_obb)
        self.cfg = dataclasses.replace(self.cfg, is_obb=is_obb)

    def _init_state(self):
        return init_state(self.cfg)

    def _lost_mask(self, state):
        # KF-predicted boxes of LOST slots feed show_kf_preds overlays
        return np.asarray(state.status) == LOST

    def _step(self, state, dets_padded, det_valid):
        return bytetrack_step(self.cfg, state, dets_padded, det_valid)
