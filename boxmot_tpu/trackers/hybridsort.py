"""HybridSort as a fixed-capacity struct-of-arrays XLA program.

Re-design of the reference HybridSort
(boxmot/trackers/bbox/hybridsort/hybridsort.py:104-737, association.py):
score-aware tracking on the 9-D XYSCR filter with four-corner-point
velocity consistency and tracklet confidence modelling (TCM).

Semantics preserved:
  * pass 1 cost: -(iou + sum of four corner velocity-direction costs -
    |kalman_score - det_conf|) with optional embedding guidance
    EG_weight_high_score * cos_dist(smooth_feat) and long-term bank mean
    features; long-term correction unmatches pairs with high embedding
    distance and low (iou - score_dif)        (association.py:525-657)
  * kalman_score = clip(state c, track_thresh, 1); simple_score from the
    confidence trend (hybridsort.py:284-321)
  * BYTE pass on low-conf dets: iou - TCM_byte_step_weight *
    |simple_score - det_conf| (+ EG_weight_low_score * emb dist), gated
    at iou_threshold with the optional low correction
  * final chance: leftover dets vs last observation boxes at IoU
  * corner velocities accumulate unit vectors over the delta_t window
    (hybridsort.py:227-260); ORU freeze/replay as in the XYSCR filter
  * output id + 1 (internal ids start at 0), last-observation boxes
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
from boxmot_tpu.ops.iou import get_asso_func, iou_batch
from boxmot_tpu.trackers.base import BaseTracker
from boxmot_tpu.trackers.botsort import IDENTITY_WARP
from boxmot_tpu.trackers.ocsort import MAX_ORU, _full_assignment, _unique_shortcut

CORNERS = ("lt", "rt", "lb", "rb")
# corner -> (x column, y column) of an xyxy box (association.py:431-470)
CORNER_COLS = {"lt": (0, 1), "rt": (0, 3), "lb": (2, 1), "rb": (2, 3)}


@dataclasses.dataclass(frozen=True)
class HybridSortConfig:
    det_thresh: float = 0.5  # high-score threshold
    low_thresh: float = 0.1
    max_age: int = 30
    min_hits: int = 3
    iou_threshold: float = 0.3
    delta_t: int = 3
    inertia: float = 0.05
    use_byte: bool = True
    track_thresh: float = 0.5
    alpha: float = 0.9
    adapfs: bool = False
    longterm_bank_length: int = 30
    with_reid: bool = True
    EG_weight_high_score: float = 4.6
    EG_weight_low_score: float = 1.3
    TCM_first_step: bool = True
    TCM_byte_step: bool = True
    TCM_byte_step_weight: float = 1.0
    with_longterm_reid: bool = True
    longterm_reid_weight: float = 0.0
    with_longterm_reid_correction: bool = True
    longterm_reid_correction_thresh: float = 0.4
    longterm_reid_correction_thresh_low: float = 0.4
    asso_func: str = "iou"
    feat_dim: int = 512
    capacity: int = 256


@struct.dataclass
class HybridSortState:
    mean: jax.Array  # (K, 9)
    cov: jax.Array  # (K, 9, 9)
    active: jax.Array
    age: jax.Array
    tsu: jax.Array
    hits: jax.Array
    hit_streak: jax.Array
    tid: jax.Array
    conf: jax.Array
    conf_pre: jax.Array  # previous confidence (-1 when absent)
    cls: jax.Array
    det_ind: jax.Array
    last_obs: jax.Array  # (K, 5)
    has_obs: jax.Array
    obs_ring: jax.Array  # (K, R, 5)
    ring_age: jax.Array
    vel: jax.Array  # (K, 4, 2) corner velocities (dy, dx)
    observed: jax.Array
    frozen_mean: jax.Array
    frozen_cov: jax.Array
    last_meas: jax.Array  # (K, 5)
    smooth: jax.Array  # (K, F)
    bank: jax.Array  # (K, L, F) long-term feature bank
    bank_count: jax.Array
    frame_count: jax.Array
    next_id: jax.Array


def init_state(cfg: HybridSortConfig) -> HybridSortState:
    K, R, F, L = cfg.capacity, cfg.delta_t, cfg.feat_dim, cfg.longterm_bank_length
    return HybridSortState(
        mean=jnp.zeros((K, 9), jnp.float32),
        cov=jnp.zeros((K, 9, 9), jnp.float32),
        active=jnp.zeros((K,), bool),
        age=jnp.zeros((K,), jnp.int32),
        tsu=jnp.zeros((K,), jnp.int32),
        hits=jnp.zeros((K,), jnp.int32),
        hit_streak=jnp.zeros((K,), jnp.int32),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        conf_pre=jnp.full((K,), -1.0, jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        last_obs=jnp.full((K, 5), -1.0, jnp.float32),
        has_obs=jnp.zeros((K,), bool),
        obs_ring=jnp.full((K, R, 5), -1.0, jnp.float32),
        ring_age=jnp.full((K, R), -1, jnp.int32),
        vel=jnp.zeros((K, 4, 2), jnp.float32),
        observed=jnp.zeros((K,), bool),
        frozen_mean=jnp.zeros((K, 9), jnp.float32),
        frozen_cov=jnp.zeros((K, 9, 9), jnp.float32),
        last_meas=jnp.zeros((K, 5), jnp.float32),
        smooth=jnp.zeros((K, F), jnp.float32),
        bank=jnp.zeros((K, L, F), jnp.float32),
        bank_count=jnp.zeros((K,), jnp.int32),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(0, jnp.int32),  # internal ids start at 0
    )


def bbox_to_z(box5):
    """[x1,y1,x2,y2,conf] -> [cx, cy, s, c, r] (hybridsort.py:46-59)."""
    w = box5[..., 2] - box5[..., 0]
    h = box5[..., 3] - box5[..., 1]
    return jnp.stack(
        [
            box5[..., 0] + w / 2.0,
            box5[..., 1] + h / 2.0,
            jnp.maximum(w * h, 1e-6),
            box5[..., 4],
            jnp.maximum(w / jnp.maximum(h, 1e-6), 1e-6),
        ],
        axis=-1,
    )


def x_to_bbox(mean):
    """state -> [x1, y1, x2, y2] (hybridsort.py:61-70)."""
    s, r = mean[..., 2], mean[..., 4]
    w = jnp.sqrt(jnp.maximum(s * r, 1e-12))
    h = s / jnp.maximum(w, 1e-6)
    cx, cy = mean[..., 0], mean[..., 1]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def _corner_speed(k_obs, det_box, corner):
    cx, cy = CORNER_COLS[corner]
    dx = det_box[None, :, cx] - k_obs[:, None, cx]
    dy = det_box[None, :, cy] - k_obs[:, None, cy]
    norm = jnp.sqrt(dx**2 + dy**2) + 1e-6
    return dy / norm, dx / norm  # (K, D)


@partial(tracker_jit, static_argnames=("cfg",))
def hybridsort_step(cfg: HybridSortConfig, state: HybridSortState, dets, det_valid, embs, warp):
    layout = kalman.make_xyscr_layout()
    K, D, R = cfg.capacity, dets.shape[0], cfg.delta_t
    frame = state.frame_count + 1
    active = state.active
    idx = jnp.arange(K)

    conf = dets[:, 4]
    first = det_valid & (conf > cfg.det_thresh)
    second = det_valid & (conf > cfg.low_thresh) & (conf < cfg.det_thresh)
    det_box = dets[:, :4]
    det_box5 = jnp.concatenate([det_box, conf[:, None]], axis=-1)
    det_z = bbox_to_z(det_box5)
    feat = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-12)

    # --- camera update: warp state corners, keep score (hybridsort.py:203-226)
    m = warp[:2, :2]
    t = warp[:2, 2]
    sb = x_to_bbox(state.mean)
    p1 = sb[:, :2] @ m.T + t
    p2 = sb[:, 2:] @ m.T + t
    wb5 = jnp.concatenate([p1, p2, state.mean[:, 3:4]], axis=-1)
    mean = state.mean.at[:, :5].set(
        jnp.where(active[:, None], bbox_to_z(wb5), state.mean[:, :5])
    )

    # --- predict
    vs_bad = (mean[:, 7] + mean[:, 2]) <= 0
    mean = mean.at[:, 7].set(jnp.where(vs_bad, 0.0, mean[:, 7]))
    mean, cov = kalman.predict(layout, mean, state.cov, active)
    age = state.age + active.astype(jnp.int32)
    hit_streak = jnp.where(active & (state.tsu > 0), 0, state.hit_streak)
    tsu = state.tsu + active.astype(jnp.int32)

    trk_box = x_to_bbox(mean)
    kal_score = jnp.clip(mean[:, 3], cfg.track_thresh, 1.0)
    simple_score = jnp.where(
        state.conf_pre < 0,
        jnp.clip(state.conf, 0.1, cfg.track_thresh),
        jnp.clip(state.conf - (state.conf_pre - state.conf), 0.1, cfg.track_thresh),
    )

    # --- k_previous_obs
    k_obs = state.last_obs
    found = jnp.zeros((K,), bool)
    for i in range(cfg.delta_t):
        dt = cfg.delta_t - i
        target = age - dt
        slot = jnp.clip(target % R, 0, R - 1)
        hit = (state.ring_age[idx, slot] == target) & (target >= 0)
        take = hit & ~found
        k_obs = jnp.where(take[:, None], state.obs_ring[idx, slot], k_obs)
        found = found | hit

    # --- pass 1: 4-corner velocity + TCM (+ optional EG)
    # Every association stage uses the CONFIGURED function, matching the
    # reference's ASSO_FUNCS[self.asso_func_name] at each call site
    # (hybridsort.py:568,590,610,648) — the tuned YAML tier runs diou,
    # whose rescaled [0,1] range admits zero-overlap matches below the
    # gate, so silently substituting plain IoU changes ghost-track
    # dynamics at MOT17 density (round-5 full-scale bisection).
    asso = get_asso_func(cfg.asso_func)
    iou1 = asso(trk_box, det_box)  # (K, D)
    angle_cost = jnp.zeros((K, D), jnp.float32)
    valid_vel = (k_obs[:, 4] >= 0)[:, None]
    for ci, corner in enumerate(CORNERS):
        Y, X = _corner_speed(k_obs, det_box, corner)
        cosang = jnp.clip(
            state.vel[:, ci, 1:2] * X + state.vel[:, ci, 0:1] * Y, -1.0, 1.0
        )
        diff = (jnp.pi / 2.0 - jnp.abs(jnp.arccos(cosang))) / jnp.pi
        angle_cost = angle_cost + valid_vel * diff * cfg.inertia * conf[None, :]
    score_dif = jnp.abs(kal_score[:, None] - conf[None, :])  # (K, D)
    angle_cost = angle_cost - score_dif  # TCM (association.py:540-543)

    sim_combo = iou1 + angle_cost
    if cfg.with_reid and cfg.EG_weight_high_score > 0 and cfg.TCM_first_step:
        emb_dist = jnp.maximum(0.0, 1.0 - state.smooth @ feat.T)  # (K, D)
        cost1 = -sim_combo + cfg.EG_weight_high_score * emb_dist
        if cfg.with_longterm_reid or cfg.with_longterm_reid_correction:
            bank_valid = (
                jnp.arange(cfg.longterm_bank_length)[None, :]
                < jnp.minimum(state.bank_count, cfg.longterm_bank_length)[:, None]
            )
            bank_sum = jnp.sum(
                jnp.where(bank_valid[..., None], state.bank, 0.0), axis=1
            )
            denom = jnp.maximum(state.bank_count, 1).astype(jnp.float32)[:, None]
            long_feat = bank_sum / denom
            long_feat = jnp.where(
                (state.bank_count > 0)[:, None], long_feat, state.smooth
            )
            ln = long_feat / jnp.maximum(
                jnp.linalg.norm(long_feat, axis=-1, keepdims=True), 1e-12
            )
            long_dist = jnp.maximum(0.0, 1.0 - ln @ feat.T)
            if cfg.with_longterm_reid:
                cost1 = cost1 + cfg.longterm_reid_weight * long_dist
        r2c1 = _full_assignment(cost1, active, first)
        c1 = jnp.clip(r2c1, 0, D - 1)
        thre = (iou1 - score_dif)[idx, c1]
        if cfg.with_longterm_reid_correction:
            bad = (emb_dist[idx, c1] > cfg.longterm_reid_correction_thresh) & (
                thre < cfg.iou_threshold
            )
        else:
            bad = thre < cfg.iou_threshold
        m1 = (r2c1 >= 0) & ~bad
    else:
        usable, r2c_s = _unique_shortcut(iou1, active, first, cfg.iou_threshold)
        r2c_f = _full_assignment(-sim_combo, active, first)
        r2c1 = jnp.where(usable, r2c_s, r2c_f)
        c1 = jnp.clip(r2c1, 0, D - 1)
        thre = (iou1 - score_dif)[idx, c1]
        keep = thre >= cfg.iou_threshold
        keep = jnp.where(usable, iou1[idx, c1] > cfg.iou_threshold, keep)
        m1 = (r2c1 >= 0) & keep
    dm = jnp.zeros((D,), bool).at[jnp.where(m1, r2c1, D)].set(True, mode="drop")
    matched = m1
    det_col = jnp.where(m1, r2c1, -1)
    feat_upd = m1  # pass 1 updates features; later passes do not

    # --- BYTE pass (hybridsort.py:607-650)
    if cfg.use_byte:
        rows2 = active & ~matched
        iou2 = asso(trk_box, det_box)
        iou2_thre = iou2
        cost2 = -iou2
        if cfg.TCM_byte_step:
            sdif2 = jnp.abs(simple_score[:, None] - conf[None, :])
            cost2 = cost2 + cfg.TCM_byte_step_weight * sdif2
        if cfg.EG_weight_low_score > 0 and cfg.with_reid:
            emb_low = jnp.maximum(0.0, 1.0 - state.smooth @ feat.T)
            cost2 = cost2 + cfg.EG_weight_low_score * emb_low
        gate2 = (
            jnp.max(jnp.where(rows2[:, None] & second[None, :], iou2, -jnp.inf))
            > cfg.iou_threshold
        )
        r2c2 = _full_assignment(cost2, rows2, second)
        c2 = jnp.clip(r2c2, 0, D - 1)
        ok2 = iou2_thre[idx, c2] >= cfg.iou_threshold
        if cfg.with_longterm_reid_correction and cfg.EG_weight_low_score > 0 and cfg.with_reid:
            ok2 = ok2 & (emb_low[idx, c2] <= cfg.longterm_reid_correction_thresh_low)
        m2 = (r2c2 >= 0) & ok2 & gate2
        matched = matched | m2
        det_col = jnp.where(m2, r2c2, det_col)
        dm = dm.at[jnp.where(m2, r2c2, D)].set(True, mode="drop")

    # --- final chance: leftover first dets vs last observations
    rows3 = active & ~matched
    cols3 = first & ~dm
    iou3 = asso(state.last_obs[:, :4], det_box)
    gate3 = (
        jnp.max(jnp.where(rows3[:, None] & cols3[None, :], iou3, -jnp.inf))
        > cfg.iou_threshold
    )
    r2c3 = _full_assignment(-iou3, rows3, cols3)
    c3 = jnp.clip(r2c3, 0, D - 1)
    m3 = (r2c3 >= 0) & (iou3[idx, c3] >= cfg.iou_threshold) & gate3
    matched = matched | m3
    det_col = jnp.where(m3, r2c3, det_col)
    dm = dm.at[jnp.where(m3, r2c3, D)].set(True, mode="drop")

    c = jnp.clip(det_col, 0, D - 1)

    # --- ORU replay (xyscr freeze/unfreeze) with 5-dim measurements
    rejoin = matched & ~state.observed & state.has_obs & (tsu > 1)
    mean = jnp.where(rejoin[:, None], state.frozen_mean, mean)
    cov = jnp.where(rejoin[:, None, None], state.frozen_cov, cov)
    gap = tsu
    z2 = det_z[c]
    m1_ = state.last_meas
    w1 = jnp.sqrt(jnp.maximum(m1_[:, 2] * m1_[:, 4], 1e-12))
    h1 = jnp.sqrt(jnp.maximum(m1_[:, 2] / jnp.maximum(m1_[:, 4], 1e-12), 1e-12))
    w2 = jnp.sqrt(jnp.maximum(z2[:, 2] * z2[:, 4], 1e-12))
    h2 = jnp.sqrt(jnp.maximum(z2[:, 2] / jnp.maximum(z2[:, 4], 1e-12), 1e-12))
    gapf = jnp.maximum(gap.astype(jnp.float32), 1.0)
    dx_ = (z2[:, 0] - m1_[:, 0]) / gapf
    dy_ = (z2[:, 1] - m1_[:, 1]) / gapf
    dw_ = (w2 - w1) / gapf
    dh_ = (h2 - h1) / gapf
    dc_ = (z2[:, 3] - m1_[:, 3]) / gapf
    def _oru_body(i, carry):
        mean, cov = carry
        act_i = rejoin & (i <= gap)
        pmean_i, pcov_i = kalman.predict(layout, mean, cov, act_i)
        mean = jnp.where(i > 1, pmean_i, mean)
        cov = jnp.where(i > 1, pcov_i, cov)
        fi = i.astype(jnp.float32)
        wi = w1 + fi * dw_
        hi = h1 + fi * dh_
        zi = jnp.stack(
            [
                m1_[:, 0] + fi * dx_,
                m1_[:, 1] + fi * dy_,
                jnp.maximum(wi * hi, 1e-6),
                m1_[:, 3] + fi * dc_,
                jnp.maximum(wi / jnp.maximum(hi, 1e-12), 1e-6),
            ],
            axis=-1,
        )
        return kalman.update(layout, mean, cov, zi, jnp.zeros((K,)), act_i)

    def _oru_replay(carry):
        n_steps = jnp.minimum(jnp.max(jnp.where(rejoin, gap, 0)), MAX_ORU).astype(
            jnp.int32
        )
        return jax.lax.fori_loop(jnp.int32(1), n_steps + 1, _oru_body, carry)

    # rejoin-free frames skip the whole replay (single-branch XLA cond)
    mean, cov = jax.lax.cond(
        jnp.any(rejoin), _oru_replay, lambda carry: carry, (mean, cov)
    )

    mean, cov = kalman.update(layout, mean, cov, z2, jnp.zeros((K,)), matched)

    # --- corner velocities: sum of unit vectors over the delta_t window
    vel = state.vel
    any_prev = jnp.zeros((K,), bool)
    acc = jnp.zeros((K, 4, 2), jnp.float32)
    for i in range(cfg.delta_t):
        target = age - i - 1
        slot = jnp.clip(target % R, 0, R - 1)
        hit = (state.ring_age[idx, slot] == target) & (target >= 0)
        prev_box = state.obs_ring[idx, slot]
        for ci, corner in enumerate(CORNERS):
            cx_col, cy_col = CORNER_COLS[corner]
            dx2 = det_box[c, cx_col] - prev_box[:, cx_col]
            dy2 = det_box[c, cy_col] - prev_box[:, cy_col]
            norm = jnp.sqrt(dx2**2 + dy2**2) + 1e-6
            contrib = jnp.stack([dy2 / norm, dx2 / norm], axis=-1)
            acc = acc.at[:, ci].add(jnp.where(hit[:, None], contrib, 0.0))
        any_prev = any_prev | hit
    # fallback to last_observation when the window had no entries
    fb = jnp.zeros((K, 4, 2), jnp.float32)
    for ci, corner in enumerate(CORNERS):
        cx_col, cy_col = CORNER_COLS[corner]
        dx2 = det_box[c, cx_col] - state.last_obs[:, cx_col]
        dy2 = det_box[c, cy_col] - state.last_obs[:, cy_col]
        norm = jnp.sqrt(dx2**2 + dy2**2) + 1e-6
        fb = fb.at[:, ci].set(jnp.stack([dy2 / norm, dx2 / norm], axis=-1))
    new_vel = jnp.where(any_prev[:, None, None], acc, fb)
    set_vel = matched & state.has_obs
    vel = jnp.where(set_vel[:, None, None], new_vel, vel)

    # --- feature updates (pass 1 only; adapfs or plain EMA)
    f = feat[c]
    if cfg.adapfs:
        pre_w = cfg.alpha * (state.conf / jnp.maximum(state.conf + conf[c], 1e-6))
        cur_w = (1 - cfg.alpha) * (conf[c] / jnp.maximum(state.conf + conf[c], 1e-6))
        s_ = pre_w + cur_w
        sm = (pre_w / s_)[:, None] * state.smooth + (cur_w / s_)[:, None] * f
    else:
        sm = cfg.alpha * state.smooth + (1 - cfg.alpha) * f
    sm = sm / jnp.maximum(jnp.linalg.norm(sm, axis=-1, keepdims=True), 1e-12)
    upd_f = feat_upd & cfg.with_reid
    # EMA/adapfs on EVERY pass-1 match: the reference seeds smooth_feat at
    # construction (hybridsort.py:174 update_features in __init__), so the
    # "first feature" full-replacement branch never runs post-birth — a
    # never-yet-observed ghost keeps ~92% of its birth identity here,
    # which is what lets it re-grab same-identity clutter much later.
    smooth = jnp.where(upd_f[:, None], sm, state.smooth)
    # push-front + drop-last: the bank feeds an order-insensitive sum
    # above, so this retains exactly the circular buffer's most-recent-L
    # set while avoiding a per-row dynamic scatter (catastrophic XLA:TPU
    # lowering — see the strongsort bank note)
    pushed = jnp.concatenate([f[:, None, :], state.bank[:, :-1, :]], axis=1)
    bank = jnp.where(upd_f[:, None, None], pushed, state.bank)
    bank_count = state.bank_count + upd_f.astype(jnp.int32)

    # --- bookkeeping
    new_obs = det_box5[c]
    last_obs = jnp.where(matched[:, None], new_obs, state.last_obs)
    slot = jnp.clip(age % R, 0, R - 1)
    obs_ring = jnp.where(
        matched[:, None, None],
        state.obs_ring.at[idx, slot].set(new_obs),
        state.obs_ring,
    )
    ring_age = jnp.where(
        matched[:, None],
        state.ring_age.at[idx, slot].set(age),
        state.ring_age,
    )
    last_meas = jnp.where(matched[:, None], z2, state.last_meas)
    has_obs = state.has_obs | matched
    hits = state.hits + matched.astype(jnp.int32)
    hit_streak = hit_streak + matched.astype(jnp.int32)
    conf_pre = jnp.where(matched, state.conf, state.conf_pre)
    conf_s = jnp.where(matched, conf[c], state.conf)
    cls_s = jnp.where(matched, dets[:, 5][c], state.cls)
    det_ind_s = jnp.where(matched, dets[:, 6][c], state.det_ind)
    tsu = jnp.where(matched, 0, tsu)

    miss = active & ~matched
    first_miss = miss & state.observed
    frozen_mean = jnp.where(first_miss[:, None], mean, state.frozen_mean)
    frozen_cov = jnp.where(first_miss[:, None, None], cov, state.frozen_cov)
    observed = jnp.where(active, matched, state.observed)
    conf_pre = jnp.where(miss, -1.0, conf_pre)  # update(None) clears the trend

    # --- new tracks from unmatched first dets
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

    init_mean_v, init_cov_v = kalman.initiate(layout, det_z[slot_det])
    mean = jnp.where(takes[:, None], init_mean_v, mean)
    cov = jnp.where(takes[:, None, None], init_cov_v, cov)
    active = active | takes
    tid = jnp.where(takes, state.next_id + free_rank, state.tid)
    conf_s = jnp.where(takes, conf[slot_det], conf_s)
    conf_pre = jnp.where(takes, -1.0, conf_pre)
    cls_s = jnp.where(takes, dets[:, 5][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, 6][slot_det], det_ind_s)
    age = jnp.where(takes, 0, age)
    tsu = jnp.where(takes, 0, tsu)
    hits = jnp.where(takes, 0, hits)
    hit_streak = jnp.where(takes, 0, hit_streak)
    has_obs = jnp.where(takes, False, has_obs)
    observed = jnp.where(takes, False, observed)
    vel = jnp.where(takes[:, None, None], 0.0, vel)
    last_obs = jnp.where(takes[:, None], -1.0, last_obs)
    ring_age = jnp.where(takes[:, None], -1, ring_age)
    smooth = jnp.where(takes[:, None], feat[slot_det], smooth)
    bank_count = jnp.where(takes, 0, bank_count)
    bank = jnp.where(takes[:, None, None], 0.0, bank)
    bank = bank.at[idx, 0].set(jnp.where(takes[:, None], feat[slot_det], bank[idx, 0]))
    bank_count = jnp.where(takes, 1, bank_count)

    dead = active & (tsu > cfg.max_age)
    active = active & ~dead

    out_box = jnp.where(has_obs[:, None], last_obs[:, :4], x_to_bbox(mean))
    out_mask = (
        active
        & (tsu < 1)
        & ((hit_streak >= cfg.min_hits) | (frame <= cfg.min_hits))
    )
    out = jnp.concatenate(
        [
            out_box,
            (tid + 1)[:, None].astype(jnp.float32),
            conf_s[:, None],
            cls_s[:, None],
            det_ind_s[:, None],
        ],
        axis=1,
    )

    new_state = HybridSortState(
        mean=mean, cov=cov, active=active, age=age, tsu=tsu, hits=hits,
        hit_streak=hit_streak, tid=tid, conf=conf_s, conf_pre=conf_pre,
        cls=cls_s, det_ind=det_ind_s, last_obs=last_obs, has_obs=has_obs,
        obs_ring=obs_ring, ring_age=ring_age, vel=vel, observed=observed,
        frozen_mean=frozen_mean, frozen_cov=frozen_cov, last_meas=last_meas,
        smooth=smooth, bank=bank, bank_count=bank_count,
        frame_count=frame, next_id=state.next_id + n_new,
    )
    return new_state, out, out_mask


class HybridSort(BaseTracker):
    """Host wrapper mirroring the reference constructor (hybridsort.py:365-443)."""

    supports_obb = False
    _id_emit_offset = 1  # internal ids start at 0, emitted as tid + 1

    def __init__(
        self,
        reid_model=None,
        cmc_method: str = "ecc",
        with_reid: bool = True,
        low_thresh: float = 0.1,
        delta_t: int = 3,
        inertia: float = 0.05,
        use_byte: bool = True,
        longterm_bank_length: int = 30,
        alpha: float = 0.9,
        adapfs: bool = False,
        track_thresh: float = 0.5,
        EG_weight_high_score: float = 4.6,
        EG_weight_low_score: float = 1.3,
        TCM_first_step: bool = True,
        TCM_byte_step: bool = True,
        TCM_byte_step_weight: float = 1.0,
        high_score_matching_thresh: float = 0.7,
        with_longterm_reid: bool = True,
        longterm_reid_weight: float = 0.0,
        with_longterm_reid_correction: bool = True,
        longterm_reid_correction_thresh: float = 0.4,
        longterm_reid_correction_thresh_low: float = 0.4,
        dataset: str = "",
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        # reference hybridsort.py:435: with_reid is honored even without a
        # reid_model (features may arrive per-update via embs=...).
        self.with_reid = bool(with_reid)
        self.model = reid_model if self.with_reid else None
        self.dataset = str(dataset)  # association hint (ref :402, inactive)
        self._warned_no_feats = False
        feat_dim = getattr(reid_model, "feature_dim", 512) if self.model else (
            512 if self.with_reid else 1
        )
        self.cfg = HybridSortConfig(
            det_thresh=self.det_thresh,
            low_thresh=low_thresh,
            max_age=self.max_age,
            min_hits=self.min_hits,
            iou_threshold=self.iou_threshold,
            delta_t=delta_t,
            inertia=inertia,
            use_byte=use_byte,
            track_thresh=track_thresh,
            alpha=alpha,
            adapfs=adapfs,
            longterm_bank_length=longterm_bank_length,
            with_reid=self.with_reid,
            EG_weight_high_score=EG_weight_high_score if self.with_reid else 0.0,
            EG_weight_low_score=EG_weight_low_score if self.with_reid else 0.0,
            TCM_first_step=TCM_first_step,
            TCM_byte_step=TCM_byte_step,
            TCM_byte_step_weight=TCM_byte_step_weight,
            with_longterm_reid=with_longterm_reid,
            longterm_reid_weight=longterm_reid_weight,
            with_longterm_reid_correction=with_longterm_reid_correction,
            longterm_reid_correction_thresh=longterm_reid_correction_thresh,
            longterm_reid_correction_thresh_low=longterm_reid_correction_thresh_low,
            asso_func=self.asso_func_name,
            feat_dim=feat_dim,
            capacity=capacity,
        )
        from boxmot_tpu.motion.cmc import create_cmc

        self.cmc = create_cmc(cmc_method)
        self._pending = {}

    def _init_state(self):
        return init_state(self.cfg)

    def update(self, dets, img=None, embs=None, masks=None):
        self._pending = {"img": img, "embs": embs}
        return super().update(dets, img, embs, masks)

    def _step(self, state, dets_padded, det_valid):
        D = dets_padded.shape[0]
        F = self.cfg.feat_dim
        emb_pad = np.ones((D, F), np.float32)
        n = int(np.asarray(det_valid).sum())
        embs = self._pending.get("embs")
        img = self._pending.get("img")
        if self.with_reid and n:
            if embs is not None:
                emb_pad[:n] = np.asarray(embs, np.float32)[:n]
            elif self.model is not None and img is not None:
                emb_pad[:n] = self.model.get_features(
                    np.asarray(dets_padded)[:n, :4], img
                )
            elif not self._warned_no_feats:
                # The reference errors out in this configuration (its
                # model is None); we run with constant features instead
                # but say so once.
                self._warned_no_feats = True
                from boxmot_tpu.utils.logging import LOGGER

                LOGGER.warning(
                    "hybridsort: with_reid=True but no reid_model and no "
                    "embs supplied — appearance terms see constant "
                    "features; pass with_reid=False for motion-only"
                )
        if self.cmc is not None and img is not None:
            warp = self.cmc.apply(img, np.asarray(dets_padded)[:n, :4])
        else:
            warp = IDENTITY_WARP
        return hybridsort_step(
            self.cfg,
            state,
            dets_padded,
            det_valid,
            jnp.asarray(emb_pad),
            jnp.asarray(warp, jnp.float32),
        )
