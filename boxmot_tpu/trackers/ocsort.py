"""OC-SORT as a fixed-capacity struct-of-arrays XLA program.

Re-design of the reference OC-SORT
(boxmot/trackers/bbox/ocsort/ocsort.py:17-556): observation-centric SORT
with an XYSR Kalman filter, velocity-direction-consistency association
cost, observation-centric recovery (OCR) against last observations, and
observation re-update (ORU) that replays the filter over interpolated
measurements when a track is re-found after misses
(motion/kalman_filters/xysr.py:379-440 freeze/unfreeze).

All of it — including the ORU replay, implemented as a bounded masked
loop — runs inside one jitted step over (K,) slot arrays.

Semantics preserved:
  * first pass: dets(conf > det_thresh) vs predicted tracks with cost
    iou + valid * ((pi/2 - |angle_diff|)/pi) * inertia * det_conf, full
    assignment then iou >= iou_threshold filter, with the reference's
    unique-candidate shortcut          (association/association.py:61-153)
  * optional BYTE pass on low-conf dets (use_byte)
  * OCR pass: leftover dets vs last observations at iou >= threshold
  * k_previous_obs ring buffer for the velocity reference point
  * output emits the last observation box (not the KF state) for
    observed tracks, gated on time_since_update < 1 and
    hit_streak >= min_hits (or warm-up frames)  (ocsort.py:527-546)
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
from boxmot_tpu.ops.geometry import obb2xysr, wrap_angle, xysr2obb, xysr2xyxy, xyxy2xysr
from boxmot_tpu.ops.iou import get_asso_func
from boxmot_tpu.ops.lap import masked_assignment
from boxmot_tpu.trackers.base import BaseTracker

MAX_ORU = 32  # bounded replay length; reference gaps are <= max_age


@dataclasses.dataclass(frozen=True)
class OcSortConfig:
    det_thresh: float = 0.3
    min_conf: float = 0.1
    max_age: int = 30
    min_hits: int = 3
    iou_threshold: float = 0.3
    delta_t: int = 3
    inertia: float = 0.2
    use_byte: bool = False
    q_xy_scaling: float = 0.01
    q_s_scaling: float = 0.0001
    asso_func: str = "iou"
    frame_w: float = 0.0  # set from the first img for centroid asso
    frame_h: float = 0.0
    is_obb: bool = False  # oriented boxes: 9-D XYSR+theta filter
    capacity: int = 256


@struct.dataclass
class OcSortState:
    mean: jax.Array  # (K, 7) xysr + velocities
    cov: jax.Array  # (K, 7, 7)
    active: jax.Array  # (K,) bool
    age: jax.Array  # (K,) i32 — predicts since creation
    tsu: jax.Array  # (K,) i32 time_since_update
    hits: jax.Array  # (K,) i32
    hit_streak: jax.Array  # (K,) i32
    tid: jax.Array  # (K,) i32
    conf: jax.Array  # (K,)
    cls: jax.Array  # (K,)
    det_ind: jax.Array  # (K,)
    last_obs: jax.Array  # (K, 5) [x1,y1,x2,y2,conf] or -1
    has_obs: jax.Array  # (K,) bool — ever updated with a detection
    obs_ring: jax.Array  # (K, R, 5) observations by age % R
    ring_age: jax.Array  # (K, R) i32 age stored, -1 empty
    velocity: jax.Array  # (K, 2) (dy, dx)
    observed: jax.Array  # (K,) bool — matched on the previous step
    frozen_mean: jax.Array  # (K, 7) snapshot at first miss (ORU)
    frozen_cov: jax.Array  # (K, 7, 7)
    last_meas: jax.Array  # (K, 4) xysr measurement of last real update
    frame_count: jax.Array  # ()
    next_id: jax.Array  # ()


def init_state(cfg: OcSortConfig) -> OcSortState:
    K, R = cfg.capacity, cfg.delta_t
    DX = 9 if cfg.is_obb else 7  # state dim
    O = 6 if cfg.is_obb else 5  # stored observation width (box + conf)
    Z = 5 if cfg.is_obb else 4  # measurement dim
    return OcSortState(
        mean=jnp.zeros((K, DX), jnp.float32),
        cov=jnp.zeros((K, DX, DX), jnp.float32),
        active=jnp.zeros((K,), bool),
        age=jnp.zeros((K,), jnp.int32),
        tsu=jnp.zeros((K,), jnp.int32),
        hits=jnp.zeros((K,), jnp.int32),
        hit_streak=jnp.zeros((K,), jnp.int32),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        last_obs=jnp.full((K, O), -1.0, jnp.float32),
        has_obs=jnp.zeros((K,), bool),
        obs_ring=jnp.full((K, R, O), -1.0, jnp.float32),
        ring_age=jnp.full((K, R), -1, jnp.int32),
        velocity=jnp.zeros((K, 2), jnp.float32),
        observed=jnp.zeros((K,), bool),
        frozen_mean=jnp.zeros((K, DX), jnp.float32),
        frozen_cov=jnp.zeros((K, DX, DX), jnp.float32),
        last_meas=jnp.zeros((K, Z), jnp.float32),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
    )


def _full_assignment(cost, row_mask, col_mask):
    """Full (max-cardinality, min-cost) assignment over valid pairs —
    lap.lapjv(extend_cost=True) semantics without a cost limit.

    Offsetting weights by ANY positive delta makes max-weight matching on
    the complete valid-pair graph maximum-cardinality (every augmenting
    edge adds >= delta) and, at max cardinality, min-cost — i.e. exactly
    lapjv's full assignment.  delta is kept SMALL relative to the cost
    range because the auction's surrender depth for hopeless rows is
    delta/eps iterations (masked_assignment docstring): the former +1.0
    offset stalled for ~10k iterations/frame at MOT17 density (60 lost
    tracks grinding prices on a handful of columns), hitting max_iters
    and silently dropping real matches."""
    valid = row_mask[:, None] & col_mask[None, :]
    hi = jnp.max(jnp.where(valid, cost, -jnp.inf))
    lo = jnp.min(jnp.where(valid, cost, jnp.inf))
    hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    delta = jnp.maximum(hi - lo, 1e-2) * 1e-2
    return masked_assignment(cost, row_mask, col_mask, hi + delta)


def _unique_shortcut(iou, row_mask, col_mask, thresh):
    """Reference shortcut (association.py:107-110): if candidates at
    iou > thresh form a perfect partial matching, use it directly."""
    a = (iou > thresh) & row_mask[:, None] & col_mask[None, :]
    ai = a.astype(jnp.int32)
    usable = (jnp.max(jnp.sum(ai, axis=1)) == 1) & (jnp.max(jnp.sum(ai, axis=0)) == 1)
    r2c = jnp.where(jnp.any(a, axis=1), jnp.argmax(ai, axis=1).astype(jnp.int32), -1)
    return usable, r2c


def _speed_direction(from_boxes, to_boxes):
    """Normalized (dy, dx) from box centers (…,4 xyxy) pairwise.

    from_boxes: (K, 4); to_boxes: (D, 4) -> (K, D, 2)."""
    fcx = (from_boxes[:, 0] + from_boxes[:, 2]) / 2.0
    fcy = (from_boxes[:, 1] + from_boxes[:, 3]) / 2.0
    tcx = (to_boxes[:, 0] + to_boxes[:, 2]) / 2.0
    tcy = (to_boxes[:, 1] + to_boxes[:, 3]) / 2.0
    dx = tcx[None, :] - fcx[:, None]
    dy = tcy[None, :] - fcy[:, None]
    norm = jnp.sqrt(dx**2 + dy**2) + 1e-6
    return dy / norm, dx / norm


@partial(tracker_jit, static_argnames=("cfg",))
def ocsort_step(cfg: OcSortConfig, state: OcSortState, dets, det_valid):
    """One frame.  dets padded: (D, 7) [x1,y1,x2,y2,conf,cls,det_ind], or
    (D, 8) [cx,cy,w,h,theta,conf,cls,det_ind] in OBB mode."""
    # Q_a gets Q_s's value — the reference passes Q_a_scaling=self.Q_s_scaling
    # at track creation (ocsort.py:518-521), so the constructor's own default
    # never applies.
    layout = kalman.make_xysr_layout(
        obb=cfg.is_obb,
        q_xy_scaling=cfg.q_xy_scaling,
        q_s_scaling=cfg.q_s_scaling,
        q_a_scaling=cfg.q_s_scaling,
    )
    asso = get_asso_func(
        cfg.asso_func + "_obb" if cfg.is_obb else cfg.asso_func,
        cfg.frame_w or None,
        cfg.frame_h or None,
    )
    K = cfg.capacity
    D = dets.shape[0]
    R = cfg.delta_t
    B = 5 if cfg.is_obb else 4  # box cols
    vs_idx = 7 if cfg.is_obb else 6  # area-velocity state index
    frame = state.frame_count + 1

    conf = dets[:, B]
    first = det_valid & (conf > cfg.det_thresh)
    second = det_valid & (conf > cfg.min_conf) & (conf < cfg.det_thresh)
    det_box = dets[:, :B]
    if cfg.is_obb:
        det_meas = obb2xysr(det_box)
    else:
        det_meas = xyxy2xysr(det_box)
    det_meas = det_meas.at[:, 2].set(jnp.maximum(det_meas[:, 2], 1e-6))
    det_meas = det_meas.at[:, 3].set(jnp.maximum(det_meas[:, 3], 1e-6))

    active = state.active

    # --- predict (KalmanBoxTracker.predict, ocsort.py:278-296):
    # zero area-velocity when it would drive the area negative.
    vs_bad = (state.mean[:, vs_idx] + state.mean[:, 2]) <= 0
    mean = state.mean.at[:, vs_idx].set(
        jnp.where(vs_bad, 0.0, state.mean[:, vs_idx])
    )
    mean, cov = kalman.predict(layout, mean, state.cov, active)
    age = state.age + active.astype(jnp.int32)
    hit_streak = jnp.where(active & (state.tsu > 0), 0, state.hit_streak)
    tsu = state.tsu + active.astype(jnp.int32)

    if cfg.is_obb:
        trk_box = xysr2obb(mean)
    else:
        trk_box = xysr2xyxy(mean[:, :4])

    # --- k_previous_obs from the ring buffer (ocsort.py:18-29)
    k_obs = state.last_obs
    found = jnp.zeros((K,), bool)
    for i in range(cfg.delta_t):
        dt = cfg.delta_t - i
        target = age - dt
        slot = jnp.clip(target % R, 0, R - 1)
        hit = (state.ring_age[jnp.arange(K), slot] == target) & (target >= 0)
        take = hit & ~found
        k_obs = jnp.where(take[:, None], state.obs_ring[jnp.arange(K), slot], k_obs)
        found = found | hit

    # --- pass 1: dets(first) vs predicted boxes with velocity-direction cost
    iou1 = asso(trk_box, det_box)  # (K, D)
    # speed_direction_batch (association.py:8-17) applies the AABB center
    # formula (b0+b2)/2 to the first 4 columns even in OBB mode, where it
    # computes (cx+w)/2 — reference quirk, replicated verbatim.
    Y, X = _speed_direction(k_obs[:, :4], det_box[:, :4])
    diff_cos = jnp.clip(
        state.velocity[:, 1:2] * X + state.velocity[:, 0:1] * Y, -1.0, 1.0
    )
    diff_angle = (jnp.pi / 2.0 - jnp.abs(jnp.arccos(diff_cos))) / jnp.pi
    # column 4 is theta in OBB mode, so observations with a negative angle
    # lose their velocity cost (association.py:104-105) — quirk preserved.
    valid_vel = (k_obs[:, 4] >= 0)[:, None]
    angle_cost = valid_vel * diff_angle * cfg.inertia * conf[None, :]

    usable, r2c_short = _unique_shortcut(iou1, active, first, cfg.iou_threshold)
    r2c_full = _full_assignment(-(iou1 + angle_cost), active, first)
    r2c1 = jnp.where(usable, r2c_short, r2c_full)
    # iou >= threshold filter (association.py:139-147)
    keep1 = (r2c1 >= 0) & (
        iou1[jnp.arange(K), jnp.clip(r2c1, 0, D - 1)] >= cfg.iou_threshold
    )
    # the shortcut path built matches from iou > threshold candidates
    keep1 = jnp.where(
        usable,
        (r2c1 >= 0)
        & (iou1[jnp.arange(K), jnp.clip(r2c1, 0, D - 1)] > cfg.iou_threshold),
        keep1,
    )
    m1 = keep1
    dm = jnp.zeros((D,), bool).at[jnp.where(m1, r2c1, D)].set(True, mode="drop")
    matched = m1
    det_col = jnp.where(m1, r2c1, -1)

    # --- optional BYTE pass on low-confidence dets (ocsort.py:455-483)
    if cfg.use_byte:
        rows2 = active & ~matched
        iou2 = asso(trk_box, det_box)
        gate2 = (
            jnp.max(
                jnp.where(rows2[:, None] & second[None, :], iou2, -jnp.inf)
            )
            > cfg.iou_threshold
        )
        r2c2 = _full_assignment(-iou2, rows2, second)
        keep2 = (
            (r2c2 >= 0)
            & (iou2[jnp.arange(K), jnp.clip(r2c2, 0, D - 1)] >= cfg.iou_threshold)
            & gate2
        )
        matched = matched | keep2
        det_col = jnp.where(keep2, r2c2, det_col)
        dm = dm.at[jnp.where(keep2, r2c2, D)].set(True, mode="drop")

    # --- OCR: leftover dets vs last observations (ocsort.py:485-510)
    rows3 = active & ~matched
    cols3 = first & ~dm
    iou3 = asso(state.last_obs[:, :B], det_box)
    gate3 = (
        jnp.max(jnp.where(rows3[:, None] & cols3[None, :], iou3, -jnp.inf))
        > cfg.iou_threshold
    )
    r2c3 = _full_assignment(-iou3, rows3, cols3)
    keep3 = (
        (r2c3 >= 0)
        & (iou3[jnp.arange(K), jnp.clip(r2c3, 0, D - 1)] >= cfg.iou_threshold)
        & gate3
    )
    matched = matched | keep3
    det_col = jnp.where(keep3, r2c3, det_col)
    dm = dm.at[jnp.where(keep3, r2c3, D)].set(True, mode="drop")

    c = jnp.clip(det_col, 0, D - 1)

    # --- ORU: re-found tracks replay the filter over interpolated
    # measurements from the frozen pre-miss state (xysr.py:384-440).
    rejoin = matched & ~state.observed & state.has_obs & (tsu > 1)
    z2 = det_meas[c]
    if cfg.is_obb:
        # OBB measurements resolve the 4-way parameterization against the
        # post-predict state BEFORE the frozen restore — the reference
        # prepares the measurement at update() entry (xysr.py:448-451),
        # then unfreezes.
        z2 = kalman.align_obb_xysr(z2, mean[:, :5])
    mean = jnp.where(rejoin[:, None], state.frozen_mean, mean)
    cov = jnp.where(rejoin[:, None, None], state.frozen_cov, cov)
    gap = tsu  # misses + 1 at the rejoin frame
    m1_ = state.last_meas
    w1 = jnp.sqrt(jnp.maximum(m1_[:, 2] * m1_[:, 3], 1e-12))
    h1 = jnp.sqrt(jnp.maximum(m1_[:, 2] / jnp.maximum(m1_[:, 3], 1e-12), 1e-12))
    w2 = jnp.sqrt(jnp.maximum(z2[:, 2] * z2[:, 3], 1e-12))
    h2 = jnp.sqrt(jnp.maximum(z2[:, 2] / jnp.maximum(z2[:, 3], 1e-12), 1e-12))
    gapf = jnp.maximum(gap.astype(jnp.float32), 1.0)
    dx = (z2[:, 0] - m1_[:, 0]) / gapf
    dy = (z2[:, 1] - m1_[:, 1]) / gapf
    dw = (w2 - w1) / gapf
    dh = (h2 - h1) / gapf
    if cfg.is_obb:
        # theta interpolates along the wrapped delta (xysr.py:417-428)
        t1 = m1_[:, 4]
        dth = wrap_angle(z2[:, 4] - t1) / gapf

    def _masked_update(mean, cov, zi, act):
        mean, cov = kalman.update(
            layout, mean, cov, zi, jnp.zeros((K,), jnp.float32), act
        )
        if cfg.is_obb:
            # angular velocity damped x0.8 after every observed update
            # (xysr.py:470-472, base.py:222-238)
            mean = mean.at[:, 8].set(
                jnp.where(act, mean[:, 8] * 0.8, mean[:, 8])
            )
        return mean, cov

    def _oru_body(i, carry):
        mean, cov = carry
        act_i = rejoin & (i <= gap)
        # predict between interpolated updates (not before the first one)
        pmean_i, pcov_i = kalman.predict(layout, mean, cov, act_i)
        mean = jnp.where(i > 1, pmean_i, mean)
        cov = jnp.where(i > 1, pcov_i, cov)
        fi = i.astype(jnp.float32)
        xi = m1_[:, 0] + fi * dx
        yi = m1_[:, 1] + fi * dy
        wi = w1 + fi * dw
        hi = h1 + fi * dh
        si = jnp.maximum(wi * hi, 1e-6)
        ri = jnp.maximum(wi / jnp.maximum(hi, 1e-12), 1e-6)
        if cfg.is_obb:
            zi = jnp.stack([xi, yi, si, ri, wrap_angle(t1 + fi * dth)], axis=-1)
            # interpolated measurements re-align against the replay state
            # (unfreeze recurses through update -> _prepare_measurement)
            zi = kalman.align_obb_xysr(zi, mean[:, :5])
        else:
            zi = jnp.stack([xi, yi, si, ri], axis=-1)
        return _masked_update(mean, cov, zi, act_i)

    def _oru_replay(carry):
        # bounded loop instead of MAX_ORU unrolled updates; ends at the
        # largest live gap so short occlusions don't pay the full bound
        n_steps = jnp.minimum(
            jnp.max(jnp.where(rejoin, gap, 0)), MAX_ORU
        ).astype(jnp.int32)
        return jax.lax.fori_loop(
            jnp.int32(1), n_steps + 1, _oru_body, carry
        )

    # the replay only runs on frames where some track actually rejoins —
    # XLA conditionals execute a single branch on TPU, so miss-free
    # frames skip the whole ORU block
    mean, cov = jax.lax.cond(
        jnp.any(rejoin), _oru_replay, lambda carry: carry, (mean, cov)
    )

    # --- regular measurement update for every matched slot
    mean, cov = _masked_update(mean, cov, z2, matched)

    # --- velocity + observation bookkeeping for matched slots
    if cfg.is_obb:
        # stored per-track velocity uses true centers (speed_direction_obb,
        # ocsort.py:82-88) — unlike the batch cost above.
        dyy = det_box[None, :, 1] - k_obs[:, 1:2]
        dxx = det_box[None, :, 0] - k_obs[:, 0:1]
        nrm = jnp.sqrt(dxx**2 + dyy**2) + 1e-6
        dy_v, dx_v = dyy / nrm, dxx / nrm
    else:
        dy_v, dx_v = _speed_direction(k_obs[:, :4], det_box)
    vel_new = jnp.stack(
        [dy_v[jnp.arange(K), c], dx_v[jnp.arange(K), c]], axis=-1
    )
    set_vel = matched & state.has_obs
    velocity = jnp.where(set_vel[:, None], vel_new, state.velocity)

    new_obs = jnp.concatenate([det_box[c], conf[c][:, None]], axis=-1)
    last_obs = jnp.where(matched[:, None], new_obs, state.last_obs)
    slot = jnp.clip(age % R, 0, R - 1)
    obs_ring = jnp.where(
        matched[:, None, None],
        state.obs_ring.at[jnp.arange(K), slot].set(new_obs),
        state.obs_ring,
    )
    ring_age = jnp.where(
        matched[:, None],
        state.ring_age.at[jnp.arange(K), slot].set(age),
        state.ring_age,
    )
    last_meas = jnp.where(matched[:, None], z2, state.last_meas)
    has_obs = state.has_obs | matched
    hits = state.hits + matched.astype(jnp.int32)
    hit_streak = hit_streak + matched.astype(jnp.int32)
    conf_s = jnp.where(matched, conf[c], state.conf)
    cls_s = jnp.where(matched, dets[:, B + 1][c], state.cls)
    det_ind_s = jnp.where(matched, dets[:, B + 2][c], state.det_ind)
    tsu = jnp.where(matched, 0, tsu)

    # --- misses: freeze on the first unobserved step (xysr.py:452-459)
    miss = active & ~matched
    first_miss = miss & state.observed
    frozen_mean = jnp.where(first_miss[:, None], mean, state.frozen_mean)
    frozen_cov = jnp.where(first_miss[:, None, None], cov, state.frozen_cov)
    observed = jnp.where(active, matched, state.observed)

    # --- new tracks from unmatched high-conf dets (ocsort.py:513-526)
    new_det = first & ~dm
    n_new = jnp.sum(new_det.astype(jnp.int32))
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1
    det_by_rank = (
        jnp.full((D,), D, jnp.int32)
        .at[jnp.where(new_det, det_rank, D)]
        .set(jnp.arange(D, dtype=jnp.int32), mode="drop")
    )
    free = ~active
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    takes = free & (free_rank < n_new)
    slot_det = jnp.clip(det_by_rank[jnp.clip(free_rank, 0, D - 1)], 0, D - 1)

    init_mean_v, init_cov_v = kalman.initiate(layout, det_meas[slot_det])
    mean = jnp.where(takes[:, None], init_mean_v, mean)
    cov = jnp.where(takes[:, None, None], init_cov_v, cov)
    active = active | takes
    tid = jnp.where(takes, state.next_id + free_rank, state.tid)
    conf_s = jnp.where(takes, conf[slot_det], conf_s)
    cls_s = jnp.where(takes, dets[:, B + 1][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, B + 2][slot_det], det_ind_s)
    age = jnp.where(takes, 0, age)
    tsu = jnp.where(takes, 0, tsu)
    hits = jnp.where(takes, 0, hits)
    hit_streak = jnp.where(takes, 0, hit_streak)
    has_obs = jnp.where(takes, False, has_obs)
    observed = jnp.where(takes, False, observed)
    velocity = jnp.where(takes[:, None], 0.0, velocity)
    last_obs = jnp.where(takes[:, None], -1.0, last_obs)
    ring_age = jnp.where(takes[:, None], -1, ring_age)

    # --- removal (ocsort.py:548-550)
    dead = active & (tsu > cfg.max_age)
    active = active & ~dead

    # --- output (ocsort.py:527-546): last observation box when available
    if cfg.is_obb:
        state_box = xysr2obb(mean)
    else:
        state_box = xysr2xyxy(mean[:, :4])
    out_box = jnp.where(has_obs[:, None], last_obs[:, :B], state_box)
    out_mask = (
        active
        & (tsu < 1)
        & ((hit_streak >= cfg.min_hits) | (frame <= cfg.min_hits))
    )
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

    new_state = OcSortState(
        mean=mean,
        cov=cov,
        active=active,
        age=age,
        tsu=tsu,
        hits=hits,
        hit_streak=hit_streak,
        tid=tid,
        conf=conf_s,
        cls=cls_s,
        det_ind=det_ind_s,
        last_obs=last_obs,
        has_obs=has_obs,
        obs_ring=obs_ring,
        ring_age=ring_age,
        velocity=velocity,
        observed=observed,
        frozen_mean=frozen_mean,
        frozen_cov=frozen_cov,
        last_meas=last_meas,
        frame_count=frame,
        next_id=state.next_id + n_new,
    )
    return new_state, out, out_mask


class OcSort(BaseTracker):
    """Host wrapper mirroring the reference constructor (ocsort.py:339-363)."""

    supports_obb = True  # 9-D XYSR+theta filter (ocsort.py:121-155)

    def __init__(
        self,
        min_conf: float = 0.1,
        delta_t: int = 3,
        inertia: float = 0.2,
        use_byte: bool = False,
        Q_xy_scaling: float = 0.01,
        Q_s_scaling: float = 0.0001,
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.cfg = OcSortConfig(
            det_thresh=self.det_thresh,
            min_conf=min_conf,
            max_age=self.max_age,
            min_hits=self.min_hits,
            iou_threshold=self.iou_threshold,
            delta_t=delta_t,
            inertia=inertia,
            use_byte=use_byte,
            q_xy_scaling=Q_xy_scaling,
            q_s_scaling=Q_s_scaling,
            asso_func=self.asso_func_name,
            is_obb=self.is_obb,
            capacity=capacity,
        )

    def _set_detection_mode(self, is_obb: bool):
        super()._set_detection_mode(is_obb)
        self.cfg = dataclasses.replace(self.cfg, is_obb=is_obb)

    def _set_frame_size(self, w: float, h: float):
        # only centroid needs it; other asso funcs keep frame-size-free
        # configs so jit programs are shared across frame sizes
        if self.cfg.asso_func == "centroid":
            self.cfg = dataclasses.replace(self.cfg, frame_w=w, frame_h=h)

    def _init_state(self):
        return init_state(self.cfg)

    def _step(self, state, dets_padded, det_valid):
        return ocsort_step(self.cfg, state, dets_padded, det_valid)
