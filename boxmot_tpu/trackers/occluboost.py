"""OccluBoost (the flagship tracker) as a struct-of-arrays XLA program.

Re-design of the reference OccluBoost
(boxmot/trackers/bbox/occluboost/occluboost.py:62-1259): BoostTrack's
multi-cue association and DLO/DUO boosting, augmented with

  * a ReID-only recovery pass re-attaching unmatched high-conf dets to
    recently-lost tracks at high appearance similarity (occluboost.py:292-345)
  * an optional appearance-gated low-confidence second pass (347-407)
  * BotSort-style confirmation: tracks born below instant_confirm_thresh
    stay tentative until confirm_hits consecutive matches (427-441, 481-489)
  * AMS (OccluTrack abnormal-motion suppression): per-track observation
    buffers detect centre/scale speed spikes with the shrink-ratio sanity
    check and damp the Kalman *mean* gain (778-846, xyhr.py:340-371)
  * online GTA: pure-appearance recovery against alive-but-drifted tracks
    (499-576) and graveyard resurrection that reuses dead track ids and
    emits linearly interpolated gap rows (610-706); GP smoothing of the
    gap rows happens host-side in flush_gta (707-760)
  * duplicate-emission suppression keeping the older track (869-905)

Divergences (documented): the duplicate-suppression pair loop is
vectorized (chain tie-breaks can differ at iou >= 0.85, which is rare);
graveyard capacity is a fixed 64 slots; gap interpolation handles at
most 8 resurrections per frame (they are rare events).
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
from boxmot_tpu.ops.lap import masked_assignment
from boxmot_tpu.trackers.base import BaseTracker
from boxmot_tpu.trackers.boosttrack import (
    BoostTrack,
    _duo_apply,
    _full_assignment,
    _iou,
    _unique_shortcut,
    boost_cost,
    camera_update_xyhr,
    dlo_boost,
    duo_boost,
    mh_distance,
    obb2xyhr,
    track_confidence,
    xyhr2obb,
    xyhr2xyxy,
    xyxy2xyhr,
)
from boxmot_tpu.ops.geometry import wrap_angle
from boxmot_tpu.ops.iou import iou_batch_obb
from boxmot_tpu.trackers.botsort import IDENTITY_WARP

GRAVE_SLOTS = 64
GAP_BUF = 4096
MAX_RES_PER_FRAME = 8
MAX_GAP_FILL = 64


@dataclasses.dataclass(frozen=True)
class OccluBoostConfig:
    det_thresh: float = 0.5
    max_age: int = 30
    min_hits: int = 3
    iou_threshold: float = 0.3
    min_box_area: int = 10
    aspect_ratio_thresh: float = 1.6
    lambda_iou: float = 0.5
    lambda_mhd: float = 0.25
    lambda_shape: float = 0.25
    use_dlo_boost: bool = True
    use_duo_boost: bool = True
    dlo_boost_coef: float = 0.65
    s_sim_corr: bool = False
    use_rich_s: bool = False
    use_sb: bool = False
    use_vt: bool = False
    with_reid: bool = True
    feat_dim: int = 512
    # OccluBoost-specific
    recovery_appearance_thresh: float = 0.99
    recovery_iou_thresh: float = 0.1
    recovery_max_age: int = 1
    feat_alpha: float = 0.95
    track_low_thresh: float = 0.1
    second_iou_thresh: float = 0.6
    second_appearance_thresh: float = 0.5
    second_pass_max_age: int = 1
    second_pass_min_hits: int = 3
    use_second_pass: bool = False
    new_track_thresh: float = 0.6
    confirm_hits: int = 2
    instant_confirm_thresh: float = 0.7
    tentative_max_age: int = 1
    duplicate_iou_thresh: float = 0.85
    ams_enabled: bool = True
    ams_alpha0: float = 0.4
    ams_threshold: float = 0.5
    ams_buffer_size: int = 30
    ams_shrink_ratio: float = 0.75
    lambda_emb_multiplier: float = 1.5
    gta_enabled: bool = True
    gta_appearance_thresh: float = 0.5
    gta_min_track_length: int = 5
    gta_interpolate: bool = True
    gta_max_gap: int = 60
    is_obb: bool = False  # OBB path: rotated IoU, no CMC/boost/AMS (occluboost.py:930-1259)
    capacity: int = 256


@struct.dataclass
class OccluBoostState:
    mean: jax.Array
    cov: jax.Array
    active: jax.Array
    age: jax.Array
    tsu: jax.Array
    hit_streak: jax.Array
    tid: jax.Array
    conf: jax.Array
    cls: jax.Array
    det_ind: jax.Array
    emb: jax.Array
    is_activated: jax.Array  # (K,)
    # AMS observation ring: cxcywh boxes
    ams_ring: jax.Array  # (K, B, 4)
    ams_count: jax.Array  # (K,)
    # graveyard
    g_valid: jax.Array  # (G,)
    g_emb: jax.Array  # (G, F)
    g_box: jax.Array  # (G, 4)
    g_frame: jax.Array  # (G,)
    g_conf: jax.Array
    g_cls: jax.Array
    g_gid: jax.Array  # (G,)
    # gap-fill rows [frame, id, x1, y1, x2, y2, conf, cls, -1]
    gap_rows: jax.Array  # (GAP_BUF, 9)
    gap_count: jax.Array  # ()
    frame_count: jax.Array
    next_id: jax.Array


def init_state(cfg: OccluBoostConfig) -> OccluBoostState:
    K, F, B, G = cfg.capacity, cfg.feat_dim, cfg.ams_buffer_size, GRAVE_SLOTS
    DX = 10 if cfg.is_obb else 8
    return OccluBoostState(
        mean=jnp.zeros((K, DX), jnp.float32),
        cov=jnp.zeros((K, DX, DX), jnp.float32),
        active=jnp.zeros((K,), bool),
        age=jnp.zeros((K,), jnp.int32),
        tsu=jnp.zeros((K,), jnp.int32),
        hit_streak=jnp.zeros((K,), jnp.int32),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        emb=jnp.zeros((K, F), jnp.float32),
        is_activated=jnp.zeros((K,), bool),
        ams_ring=jnp.zeros((K, B, 4), jnp.float32),
        ams_count=jnp.zeros((K,), jnp.int32),
        g_valid=jnp.zeros((G,), bool),
        g_emb=jnp.zeros((G, F), jnp.float32),
        g_box=jnp.zeros((G, 4), jnp.float32),
        g_frame=jnp.zeros((G,), jnp.int32),
        g_conf=jnp.zeros((G,), jnp.float32),
        g_cls=jnp.zeros((G,), jnp.float32),
        g_gid=jnp.zeros((G,), jnp.int32),
        gap_rows=jnp.zeros((GAP_BUF, 9), jnp.float32),
        gap_count=jnp.asarray(0, jnp.int32),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
    )


def _ams_alpha(cfg, ring, count, det_box_cxcywh):
    """Abnormal-motion-suppression alpha per slot (occluboost.py:778-846).

    ring: (K, B, 4) past observed cxcywh; count: (K,) total writes.
    Returns (alpha (K,), new_ring, new_count) — alpha computed BEFORE the
    current observation is appended, matching the reference buffer flow.
    """
    K, B = ring.shape[0], ring.shape[1]
    live = jnp.minimum(count, B)
    has2 = live >= 2
    idx = jnp.arange(K)
    prev_pos = jnp.clip((count - 1) % B, 0, B - 1)
    oldest_pos = jnp.clip((count - live) % B, 0, B - 1)
    prev = ring[idx, prev_pos]
    oldest = ring[idx, oldest_pos]

    cur_v = det_box_cxcywh - prev
    # mean of consecutive diffs telescopes to (last - first)/(n-1)
    denom = jnp.maximum(live - 1, 1).astype(jnp.float32)
    mean_v = (prev - oldest) / denom[:, None]

    eps = 1e-6
    cur_c = jnp.linalg.norm(cur_v[:, :2], axis=-1)
    mean_c = jnp.linalg.norm(mean_v[:, :2], axis=-1)
    cur_a = jnp.linalg.norm(cur_v[:, 2:], axis=-1)
    mean_a = jnp.linalg.norm(mean_v[:, 2:], axis=-1)
    d_c = jnp.maximum(0.0, cur_c - mean_c) / jnp.maximum(mean_c, eps)
    d_a = jnp.maximum(0.0, cur_a - mean_a) / jnp.maximum(mean_a, eps)
    alpha_c = jnp.where(d_c <= cfg.ams_threshold, 1.0, cfg.ams_alpha0)
    alpha_a = jnp.where(d_a <= cfg.ams_threshold, 1.0, cfg.ams_alpha0)
    alpha = 0.5 * (alpha_c + alpha_a)

    # shrink-ratio sanity check: only suppress genuinely shrinking boxes
    live_mask = jnp.arange(B)[None, :] < live[:, None]
    areas = ring[..., 2] * ring[..., 3]
    mean_area = jnp.sum(jnp.where(live_mask, areas, 0.0), axis=1) / jnp.maximum(
        live, 1
    ).astype(jnp.float32)
    cur_area = det_box_cxcywh[:, 2] * det_box_cxcywh[:, 3]
    alpha = jnp.where(cur_area >= mean_area * cfg.ams_shrink_ratio, 1.0, alpha)
    alpha = jnp.where(has2, alpha, 1.0)
    if not cfg.ams_enabled or cfg.ams_alpha0 >= 1.0:
        alpha = jnp.ones((K,), jnp.float32)
    return alpha


def _ams_append(ring, count, det_box_cxcywh, mask):
    K, B = ring.shape[0], ring.shape[1]
    idx = jnp.arange(K)
    pos = jnp.clip(count % B, 0, B - 1)
    new_ring = ring.at[idx, pos].set(
        jnp.where(mask[:, None], det_box_cxcywh, ring[idx, pos])
    )
    return new_ring, count + mask.astype(jnp.int32)


def _gated_lsa_max(sim, row_mask, col_mask):
    """Maximize similarity over gated pairs (entries <= 0 invalid), like
    the reference's linear_sum_assignment(-gated) + gated > 0 filter."""
    cost = -sim
    r2c = _full_assignment(cost, row_mask, col_mask)
    K = sim.shape[0]
    D = sim.shape[1]
    c = jnp.clip(r2c, 0, D - 1)
    ok = (r2c >= 0) & (sim[jnp.arange(K), c] > 0)
    return jnp.where(ok, r2c, -1)


@partial(tracker_jit, static_argnames=("cfg",))
def occluboost_step(cfg: OccluBoostConfig, state: OccluBoostState, dets, det_valid, embs, warp):
    layout = kalman.make_xyhr_layout(obb=cfg.is_obb)
    K, D = cfg.capacity, dets.shape[0]
    B = 5 if cfg.is_obb else 4  # box cols
    frame = state.frame_count + 1
    active = state.active

    det_box = dets[:, :B]
    conf = jnp.where(det_valid, dets[:, B], -1.0)
    orig_conf = conf

    # --- camera update + predict.  The OBB path skips CMC and the DLO/DUO
    # confidence boosts — they are tied to the AABB representation
    # (occluboost.py:936-943).
    if cfg.is_obb:
        mean = state.mean
    else:
        mean = camera_update_xyhr(state.mean, warp, active)
    mean, cov = kalman.predict(layout, mean, state.cov, active)
    age = state.age + active.astype(jnp.int32)
    hit_streak = jnp.where(active & (state.tsu > 0), 0, state.hit_streak)
    tsu = state.tsu + active.astype(jnp.int32)
    trk_conf = track_confidence(age, tsu, active)

    if cfg.is_obb:
        trk_box = xyhr2obb(mean)  # (K, 5) xywha
        det_z = obb2xyhr(det_box)
    else:
        trk_box = xyhr2xyxy(mean[:, :4])
        det_z = xyxy2xyhr(det_box)
        md = mh_distance(det_box, mean, cov, None)
        pair_valid = det_valid[:, None] & active[None, :]

        if cfg.use_dlo_boost:
            conf = dlo_boost(cfg, conf, det_valid, det_box, trk_box, trk_conf, tsu, md, pair_valid)
        if cfg.use_duo_boost:
            cand = duo_boost(cfg, conf, det_valid, md, pair_valid, active)
            conf = _duo_apply(cfg, conf, det_valid, det_box, cand)

    first = det_valid & (conf >= cfg.det_thresh)
    second = (
        det_valid
        & ~first
        & (orig_conf >= cfg.track_low_thresh)
        & (orig_conf < cfg.det_thresh)
        if cfg.use_second_pass
        else jnp.zeros((D,), bool)
    )

    det_emb = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-12)

    emb_cost = det_emb @ state.emb.T if cfg.with_reid else jnp.zeros((D, K), jnp.float32)
    if cfg.is_obb:
        # --- pass 1 (OBB): rotated IoU cost, gated at iou_threshold, with
        # BoTSORT-style appearance fusion (occluboost.py:1005-1050)
        iou_dk = iou_batch_obb(det_box, trk_box)  # (D, K)
        gate1 = iou_dk < cfg.iou_threshold
        cost = jnp.where(gate1, 1e6, 1.0 - iou_dk)
        if cfg.with_reid:
            lambda_emb = cfg.lambda_iou + 0.5
            cost = cost - lambda_emb * emb_cost
            cost = jnp.where(gate1, 1e6, cost)
        cost_kd = cost.T
        r2c1 = _full_assignment(cost_kd, active, first)
        c1 = jnp.clip(r2c1, 0, D - 1)
        m1 = (r2c1 >= 0) & (cost_kd[jnp.arange(K), c1] < 1e5)
        inv_det1 = jnp.zeros((D,), bool)
    else:
        # --- pass 1: BoostTrack multi-cue association
        iou_dk = _iou(det_box, trk_box)
        iou_dk_gated = jnp.where(first[:, None] & active[None, :], iou_dk, 0.0)
        cost = boost_cost(
            cfg, det_box, trk_box, conf, trk_conf, md, iou_dk_gated,
            first[:, None] & active[None, :], emb_cost, cfg.lambda_emb_multiplier,
        )
        cost_kd = cost.T
        usable, r2c_short = _unique_shortcut(cost_kd, active, first, cfg.iou_threshold)
        r2c_full = _full_assignment(-cost_kd, active, first)
        r2c1 = jnp.where(usable, r2c_short, r2c_full)
        c1 = jnp.clip(r2c1, 0, D - 1)
        iou_of = iou_dk_gated.T[jnp.arange(K), c1]
        emb_of = emb_cost.T[jnp.arange(K), c1]
        valid1 = (iou_of >= cfg.iou_threshold) | (
            cfg.with_reid & (emb_of >= 0.75) & (iou_of >= cfg.iou_threshold / 2)
        )
        m1 = (r2c1 >= 0) & valid1
        # dets whose assignment failed the validity gate go to the END of
        # the reference's unmatched list (assoc.py:132-151) — new-track ID
        # order must follow (the OBB branch builds unmatched ascending,
        # occluboost.py:1047-1050, so no flag needed there)
        inv_det1 = (
            jnp.zeros((D,), bool)
            .at[jnp.where((r2c1 >= 0) & ~valid1, r2c1, D)]
            .set(True, mode="drop")
        )

    unmatched_trk0 = active & ~m1  # reference's fixed unmatched_trks set
    dm = jnp.zeros((D,), bool).at[jnp.where(m1, r2c1, D)].set(True, mode="drop")

    def apply_update(mean, cov, ring, count, emb, matched, det_idx, alpha_emb, streak, tsu_, conf_, cls_, dind_):
        """KF + AMS + embedding + bookkeeping for one pass's matches."""
        cc = jnp.clip(det_idx, 0, D - 1)
        z = det_z[cc]
        if cfg.is_obb:
            # AMS is skipped for OBB tracks (occluboost.py:912-918); the
            # measurement angle aligns to the state (xyhr.py:350-355).
            alpha = jnp.ones((K,), jnp.float32)
            z = z.at[:, 4].set(mean[:, 4] + wrap_angle(z[:, 4] - mean[:, 4]))
        else:
            cxcywh = jnp.stack(
                [
                    (det_box[cc, 0] + det_box[cc, 2]) / 2,
                    (det_box[cc, 1] + det_box[cc, 3]) / 2,
                    jnp.maximum(det_box[cc, 2] - det_box[cc, 0], 1e-6),
                    jnp.maximum(det_box[cc, 3] - det_box[cc, 1], 1e-6),
                ],
                axis=-1,
            )
            alpha = _ams_alpha(cfg, ring, count, cxcywh)
            ring, count = _ams_append(ring, count, cxcywh, matched)
        mean, cov = kalman.update(
            layout, mean, cov, z, jnp.zeros((K,), jnp.float32), matched,
            gain_scale=alpha,
        )
        if cfg.with_reid:
            a = alpha_emb[:, None]
            new_emb = a * emb + (1 - a) * det_emb[cc]
            new_emb = new_emb / jnp.maximum(
                jnp.linalg.norm(new_emb, axis=-1, keepdims=True), 1e-12
            )
            emb = jnp.where(matched[:, None], new_emb, emb)
        streak = streak + matched.astype(jnp.int32)
        tsu_ = jnp.where(matched, 0, tsu_)
        conf_ = jnp.where(matched, conf[cc], conf_)
        cls_ = jnp.where(matched, dets[:, B + 1][cc], cls_)
        dind_ = jnp.where(matched, dets[:, B + 2][cc], dind_)
        return mean, cov, ring, count, emb, streak, tsu_, conf_, cls_, dind_

    trust = (conf - cfg.det_thresh) / (1 - cfg.det_thresh)
    det_alpha_all = 0.95 + 0.05 * (1 - trust)

    ring, count = state.ams_ring, state.ams_count
    emb = state.emb
    conf_s, cls_s, det_ind_s = state.conf, state.cls, state.det_ind
    (mean, cov, ring, count, emb, hit_streak, tsu, conf_s, cls_s, det_ind_s) = apply_update(
        mean, cov, ring, count, emb, m1, r2c1, det_alpha_all[c1], hit_streak, tsu,
        conf_s, cls_s, det_ind_s,
    )
    is_activated = state.is_activated | (
        m1 & (hit_streak >= cfg.confirm_hits)
    )

    det_unmatched = first & ~dm

    # --- ReID-only recovery pass (occluboost.py:292-345)
    if cfg.with_reid:
        elig = unmatched_trk0 & (tsu <= cfg.recovery_max_age)
        sim = emb @ det_emb.T  # (K, D) — current (possibly updated) embs
        if cfg.is_obb:
            ious_rec = iou_batch_obb(trk_box, det_box)
        else:
            ious_rec = _iou(trk_box, det_box)  # predicted track boxes
        gated = jnp.where(ious_rec < cfg.recovery_iou_thresh, -1.0, sim)
        gated = jnp.where(sim < cfg.recovery_appearance_thresh, -1.0, gated)
        r2c_rec = _gated_lsa_max(gated, elig, det_unmatched)
        m_rec = r2c_rec >= 0
        fa = jnp.full((K,), cfg.feat_alpha, jnp.float32)
        (mean, cov, ring, count, emb, hit_streak, tsu, conf_s, cls_s, det_ind_s) = apply_update(
            mean, cov, ring, count, emb, m_rec, r2c_rec, fa, hit_streak, tsu,
            conf_s, cls_s, det_ind_s,
        )
        is_activated = is_activated | (m_rec & (hit_streak >= cfg.confirm_hits))
        dm = dm.at[jnp.where(m_rec, r2c_rec, D)].set(True, mode="drop")
        det_unmatched = first & ~dm

    # --- appearance-gated low-confidence second pass (occluboost.py:347-407)
    if cfg.use_second_pass:
        elig2 = (
            unmatched_trk0
            & (tsu <= cfg.second_pass_max_age)
            & (hit_streak >= cfg.second_pass_min_hits)
            & is_activated
        )
        if cfg.is_obb:
            ious2 = iou_batch_obb(trk_box, det_box)
        else:
            ious2 = _iou(trk_box, det_box)
        cost2 = jnp.where(ious2 < cfg.second_iou_thresh, 1.0, 1.0 - ious2)
        if cfg.with_reid:
            sim2 = emb @ det_emb.T
            cost2 = jnp.where(sim2 < cfg.second_appearance_thresh, 1.0, cost2)
        r2c_2 = masked_assignment(cost2, elig2, second, 1.0)
        m_2 = r2c_2 >= 0
        fa = jnp.full((K,), cfg.feat_alpha, jnp.float32)
        (mean, cov, ring, count, emb, hit_streak, tsu, conf_s, cls_s, det_ind_s) = apply_update(
            mean, cov, ring, count, emb, m_2, r2c_2, fa, hit_streak, tsu,
            conf_s, cls_s, det_ind_s,
        )
        is_activated = is_activated | (m_2 & (hit_streak >= cfg.confirm_hits))

    # --- GTA pure-appearance recovery (occluboost.py:499-576)
    if cfg.gta_enabled and cfg.with_reid:
        elig_g = (
            unmatched_trk0
            & (tsu <= cfg.gta_max_gap)
            & (age >= cfg.gta_min_track_length)
        )
        sim_g = emb @ det_emb.T
        gated_g = jnp.where(sim_g < cfg.gta_appearance_thresh, -1.0, sim_g)
        r2c_g = _gated_lsa_max(gated_g, elig_g, det_unmatched)
        m_g = r2c_g >= 0
        fa = jnp.full((K,), cfg.feat_alpha, jnp.float32)
        (mean, cov, ring, count, emb, hit_streak, tsu, conf_s, cls_s, det_ind_s) = apply_update(
            mean, cov, ring, count, emb, m_g, r2c_g, fa, hit_streak, tsu,
            conf_s, cls_s, det_ind_s,
        )
        is_activated = is_activated | (m_g & (hit_streak >= cfg.confirm_hits))
        dm = dm.at[jnp.where(m_g, r2c_g, D)].set(True, mode="drop")
        det_unmatched = first & ~dm

    # --- GTA graveyard resurrection (occluboost.py:610-706)
    g_valid = state.g_valid
    g_emb, g_box, g_frame = state.g_emb, state.g_box, state.g_frame
    g_conf, g_cls, g_gid = state.g_conf, state.g_cls, state.g_gid
    gap_rows, gap_count = state.gap_rows, state.gap_count
    res_det = jnp.zeros((D,), bool)
    res_gid = jnp.zeros((D,), jnp.int32)
    res_gslot = jnp.zeros((D,), jnp.int32)
    if cfg.gta_enabled and cfg.with_reid:
        res_cand = det_unmatched & (conf >= cfg.new_track_thresh)
        sim_r = det_emb @ g_emb.T  # (D, G)
        gated_r = jnp.where(sim_r < cfg.gta_appearance_thresh, -1.0, sim_r)
        d2g = _gated_lsa_max(gated_r, res_cand, g_valid)
        res_det = d2g >= 0
        gs = jnp.clip(d2g, 0, GRAVE_SLOTS - 1)
        res_gid = g_gid[gs]
        res_gslot = gs
        # consume graveyard entries
        g_valid = g_valid & ~(
            jnp.zeros((GRAVE_SLOTS,), bool)
            .at[jnp.where(res_det, gs, GRAVE_SLOTS)]
            .set(True, mode="drop")
        )

    # --- new tracks (incl. resurrected ids)
    new_det = det_unmatched & (conf >= cfg.new_track_thresh)
    n_fresh = jnp.sum((new_det & ~res_det).astype(jnp.int32))
    fresh = new_det & ~res_det
    order_key = jnp.arange(D, dtype=jnp.int32) + D * inv_det1.astype(jnp.int32)
    det_rank = jnp.sum(
        (order_key[None, :] < order_key[:, None]) & fresh[None, :], axis=1
    )
    # resurrected dets get their reused id; fresh dets get sequential ids
    det_tid = jnp.where(res_det, res_gid, state.next_id + det_rank)
    n_new = jnp.sum(new_det.astype(jnp.int32))
    all_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1
    det_by_rank = (
        jnp.full((D,), D, jnp.int32)
        .at[jnp.where(new_det, all_rank, D)]
        .set(jnp.arange(D, dtype=jnp.int32), mode="drop")
    )
    free = ~active
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    takes = free & (free_rank < n_new)
    slot_det = jnp.clip(det_by_rank[jnp.clip(free_rank, 0, D - 1)], 0, D - 1)

    init_mean_v, init_cov_v = kalman.initiate(layout, det_z[slot_det])
    mean = jnp.where(takes[:, None], init_mean_v, mean)
    cov = jnp.where(takes[:, None, None], init_cov_v, cov)
    active2 = active | takes
    tid = jnp.where(takes, det_tid[slot_det], state.tid)
    conf_s = jnp.where(takes, conf[slot_det], conf_s)
    cls_s = jnp.where(takes, dets[:, B + 1][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, B + 2][slot_det], det_ind_s)
    age = jnp.where(takes, 0, age)
    tsu = jnp.where(takes, 0, tsu)
    hit_streak = jnp.where(takes, 0, hit_streak)
    emb = jnp.where(takes[:, None], det_emb[slot_det], emb)
    count = jnp.where(takes, 0, count)
    new_activated = (
        res_det[slot_det]  # resurrected tracks activate immediately
        | (conf[slot_det] >= cfg.instant_confirm_thresh)
        | (cfg.confirm_hits <= 1)
    )
    is_activated = jnp.where(takes, new_activated, is_activated)

    # --- gap interpolation rows for resurrections (occluboost.py:676-700):
    # build the (MAX_RES, MAX_GAP_FILL, 9) candidate block vectorized and
    # append all valid rows to the buffer with a single prefix-sum scatter.
    if cfg.gta_enabled and cfg.with_reid and cfg.gta_interpolate:

        def _gap_fill(carry):
            gap_rows, gap_count = carry
            order = jnp.argsort(~res_det)[:MAX_RES_PER_FRAME]  # resurrected first
            d_i = order  # (R,)
            valid_r = res_det[d_i]
            gs = res_gslot[d_i]
            death = g_frame[gs]  # (R,)
            gap = frame - death
            do_fill = valid_r & (gap > 1) & (gap <= cfg.gta_max_gap)
            last_box = g_box[gs]  # (R, 4)
            cur_box = det_box[d_i][:, :4]  # (R, 4); OBB drops theta (ref quirk)
            t_steps = jnp.arange(1, MAX_GAP_FILL, dtype=jnp.int32)  # (T,)
            in_gap = do_fill[:, None] & (t_steps[None, :] < gap[:, None])  # (R, T)
            a_t = t_steps[None, :].astype(jnp.float32) / jnp.maximum(
                gap[:, None].astype(jnp.float32), 1.0
            )
            ib = (1 - a_t)[..., None] * last_box[:, None, :] + a_t[..., None] * cur_box[:, None, :]
            frames_rt = (death[:, None] + t_steps[None, :]).astype(jnp.float32)
            ids_rt = jnp.broadcast_to(
                res_gid[d_i][:, None].astype(jnp.float32), frames_rt.shape
            )
            conf_rt = jnp.broadcast_to(g_conf[gs][:, None], frames_rt.shape)
            cls_rt = jnp.broadcast_to(g_cls[gs][:, None], frames_rt.shape)
            rows = jnp.concatenate(
                [
                    frames_rt[..., None],
                    ids_rt[..., None],
                    ib,
                    conf_rt[..., None],
                    cls_rt[..., None],
                    jnp.full(frames_rt.shape + (1,), -1.0, jnp.float32),
                ],
                axis=-1,
            ).reshape(-1, 9)
            flat_valid = in_gap.reshape(-1)
            offsets = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
            pos = jnp.where(flat_valid, gap_count + offsets, GAP_BUF)
            pos = jnp.where(pos >= GAP_BUF, GAP_BUF, pos)  # drop on overflow
            gap_rows = gap_rows.at[pos].set(rows, mode="drop")
            gap_count = jnp.minimum(
                gap_count + jnp.sum(flat_valid.astype(jnp.int32)), GAP_BUF
            )
            return gap_rows, gap_count

        # resurrections are rare — frames without one skip the whole
        # interpolation block (single-branch XLA cond)
        gap_rows, gap_count = jax.lax.cond(
            jnp.any(res_det), _gap_fill, lambda carry: carry, (gap_rows, gap_count)
        )

    # --- emission + duplicate suppression (occluboost.py:427-475, 869-905)
    if cfg.is_obb:
        out_box = xyhr2obb(mean)  # (K, 5) xywha
    else:
        out_box = xyhr2xyxy(mean[:, :4])
    warmup = frame <= cfg.min_hits
    emit = (
        active2
        & (tsu < 1)
        & is_activated
        & ((hit_streak >= cfg.min_hits) | warmup)
    )
    if 0.0 < cfg.duplicate_iou_thresh < 1.0:
        pij = iou_batch_obb(out_box, out_box) if cfg.is_obb else _iou(out_box, out_box)
        pij = jnp.where(emit[:, None] & emit[None, :], pij, 0.0)
        pij = pij - jnp.eye(K) * pij
        older = (age[:, None] >= age[None, :])
        kill = jnp.any((pij >= cfg.duplicate_iou_thresh) & older, axis=0)
        # remove killed (younger) tracks entirely (occluboost.py:899-904)
        emit = emit & ~kill
        active2 = active2 & ~kill

    if cfg.is_obb:
        out_mask = emit  # no aspect/area gate in the OBB path
    else:
        w_arr = out_box[:, 2] - out_box[:, 0]
        h_arr = out_box[:, 3] - out_box[:, 1]
        shape_ok = (w_arr / jnp.maximum(h_arr, 1e-12) <= cfg.aspect_ratio_thresh) & (
            w_arr * h_arr > cfg.min_box_area
        )
        out_mask = emit & shape_ok
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

    # --- lifecycle + graveyard burial (occluboost.py:477-495)
    alive = (tsu <= cfg.max_age) & (is_activated | (tsu <= cfg.tentative_max_age))
    dead = active2 & ~alive
    active2 = active2 & alive

    if cfg.gta_enabled and cfg.with_reid:
        # evict stale graveyard entries first
        g_valid = g_valid & ((frame - g_frame) <= cfg.gta_max_gap)
        # bury eligible dead tracks into free graveyard slots
        bury = dead & (age >= cfg.gta_min_track_length)
        n_bury = jnp.sum(bury.astype(jnp.int32))
        bury_rank = jnp.cumsum(bury.astype(jnp.int32)) - 1
        slot_free = ~g_valid
        gfree_rank = jnp.cumsum(slot_free.astype(jnp.int32)) - 1
        g_takes = slot_free & (gfree_rank < n_bury)
        trk_by_rank = (
            jnp.full((K,), K, jnp.int32)
            .at[jnp.where(bury, bury_rank, K)]
            .set(jnp.arange(K, dtype=jnp.int32), mode="drop")
        )
        src = jnp.clip(trk_by_rank[jnp.clip(gfree_rank, 0, K - 1)], 0, K - 1)
        g_emb = jnp.where(g_takes[:, None], emb[src], g_emb)
        g_box = jnp.where(g_takes[:, None], out_box[src, :4], g_box)
        g_frame = jnp.where(g_takes, frame, g_frame)
        g_conf = jnp.where(g_takes, conf_s[src], g_conf)
        g_cls = jnp.where(g_takes, cls_s[src], g_cls)
        g_gid = jnp.where(g_takes, tid[src], g_gid)
        g_valid = g_valid | g_takes

    new_state = OccluBoostState(
        mean=mean,
        cov=cov,
        active=active2,
        age=age,
        tsu=tsu,
        hit_streak=hit_streak,
        tid=tid,
        conf=conf_s,
        cls=cls_s,
        det_ind=det_ind_s,
        emb=emb,
        is_activated=is_activated,
        ams_ring=ring,
        ams_count=count,
        g_valid=g_valid,
        g_emb=g_emb,
        g_box=g_box,
        g_frame=g_frame,
        g_conf=g_conf,
        g_cls=g_cls,
        g_gid=g_gid,
        gap_rows=gap_rows,
        gap_count=gap_count,
        frame_count=frame,
        next_id=state.next_id + n_fresh,
    )
    return new_state, out, out_mask


def flush_gta_rows(state: OccluBoostState, smooth_tau: float = 5.0) -> np.ndarray:
    """Host-side flush of accumulated gap-fill rows with GP smoothing
    (occluboost.py:707-760).  Returns (N, 9) MOT rows."""
    n = int(np.asarray(state.gap_count))
    if n == 0:
        return np.empty((0, 9))
    rows = np.asarray(state.gap_rows)[: min(n, GAP_BUF)].astype(float)
    return smooth_gap_rows(rows, smooth_tau)


def smooth_gap_rows(rows: np.ndarray, smooth_tau: float = 5.0) -> np.ndarray:
    """GP-smooth raw gap-fill rows (occluboost.py:707-760).  Shared by the
    device flush and the native core flush (bmt_tracker_flush_rows), which
    both emit raw [frame, id, x1, y1, x2, y2, conf, cls, -1] rows."""
    if smooth_tau > 0 and len(rows) >= 3:
        try:
            from sklearn.gaussian_process import GaussianProcessRegressor as GPR
            from sklearn.gaussian_process.kernels import RBF
        except ImportError:
            return rows
        for tid in np.unique(rows[:, 1]):
            idx = np.where(rows[:, 1] == tid)[0]
            if len(idx) < 3:
                continue
            frames = rows[idx, 0].reshape(-1, 1)
            boxes = rows[idx, 2:6]
            tau = smooth_tau
            length_scale = np.clip(
                tau * np.log(max(tau**3 / len(idx), 1e-6)), tau**-1, tau**2
            )
            kernel = RBF(length_scale, length_scale_bounds="fixed")
            smoothed = GPR(kernel).fit(frames, boxes).predict(frames)
            rows[idx, 2:6] = smoothed
    return rows


class OccluBoost(BaseTracker):
    """Host wrapper mirroring the reference constructor (occluboost.py:86-183)."""

    supports_obb = True  # XYHR-theta layout (occluboost.py:82, 930-1259)

    def __init__(
        self,
        reid_model=None,
        recovery_appearance_thresh: float = 0.99,
        recovery_iou_thresh: float = 0.1,
        recovery_max_age: int = 1,
        feat_alpha: float = 0.95,
        track_low_thresh: float = 0.1,
        second_iou_thresh: float = 0.6,
        second_appearance_thresh: float = 0.5,
        second_pass_max_age: int = 1,
        second_pass_min_hits: int = 3,
        use_second_pass: bool = False,
        new_track_thresh: float = 0.6,
        confirm_hits: int = 2,
        instant_confirm_thresh: float = 0.7,
        tentative_max_age: int = 1,
        duplicate_iou_thresh: float = 0.85,
        ams_enabled: bool = True,
        ams_alpha0: float = 0.4,
        ams_threshold: float = 0.5,
        ams_buffer_size: int = 30,
        ams_shrink_ratio: float = 0.75,
        lambda_emb_multiplier: float = 1.5,
        gta_enabled: bool = True,
        gta_appearance_thresh: float = 0.5,
        gta_min_track_length: int = 5,
        gta_smooth_tau: float = 5.0,
        gta_interpolate: bool = True,
        gta_max_gap: int = 60,
        adaptive_kf: bool = False,
        # BoostTrack passthrough
        use_cmc: bool = True,
        cmc_method: str = "ecc",
        min_box_area: int = 10,
        aspect_ratio_thresh: float = 1.6,
        lambda_iou: float = 0.5,
        lambda_mhd: float = 0.25,
        lambda_shape: float = 0.25,
        use_dlo_boost: bool = True,
        use_duo_boost: bool = True,
        dlo_boost_coef: float = 0.65,
        s_sim_corr: bool = False,
        use_rich_s: bool = False,
        use_sb: bool = False,
        use_vt: bool = False,
        with_reid: bool = True,
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.with_reid = with_reid and reid_model is not None
        self.model = reid_model if self.with_reid else None
        feat_dim = getattr(reid_model, "feature_dim", 512) if self.model else 1
        self.gta_smooth_tau = gta_smooth_tau
        self.cfg = OccluBoostConfig(
            det_thresh=self.det_thresh,
            max_age=self.max_age,
            min_hits=self.min_hits,
            iou_threshold=self.iou_threshold,
            min_box_area=min_box_area,
            aspect_ratio_thresh=aspect_ratio_thresh,
            lambda_iou=lambda_iou,
            lambda_mhd=lambda_mhd,
            lambda_shape=lambda_shape,
            use_dlo_boost=use_dlo_boost,
            use_duo_boost=use_duo_boost,
            dlo_boost_coef=dlo_boost_coef,
            s_sim_corr=s_sim_corr,
            use_rich_s=use_rich_s,
            use_sb=use_sb,
            use_vt=use_vt,
            with_reid=self.with_reid,
            feat_dim=feat_dim,
            recovery_appearance_thresh=recovery_appearance_thresh,
            recovery_iou_thresh=recovery_iou_thresh,
            recovery_max_age=recovery_max_age,
            feat_alpha=feat_alpha,
            track_low_thresh=track_low_thresh,
            second_iou_thresh=second_iou_thresh,
            second_appearance_thresh=second_appearance_thresh,
            second_pass_max_age=second_pass_max_age,
            second_pass_min_hits=second_pass_min_hits,
            use_second_pass=use_second_pass,
            new_track_thresh=max(new_track_thresh, 0.0),
            confirm_hits=max(int(confirm_hits), 1),
            instant_confirm_thresh=instant_confirm_thresh,
            tentative_max_age=max(int(tentative_max_age), 0),
            duplicate_iou_thresh=duplicate_iou_thresh,
            ams_enabled=ams_enabled,
            ams_alpha0=float(np.clip(ams_alpha0, 0.0, 1.0)),
            ams_threshold=max(ams_threshold, 0.0),
            ams_buffer_size=max(int(ams_buffer_size), 2),
            ams_shrink_ratio=float(np.clip(ams_shrink_ratio, 0.0, 1.0)),
            lambda_emb_multiplier=lambda_emb_multiplier,
            gta_enabled=bool(gta_enabled) and self.with_reid,
            gta_appearance_thresh=gta_appearance_thresh,
            gta_min_track_length=max(int(gta_min_track_length), 1),
            gta_interpolate=gta_interpolate,
            gta_max_gap=max(int(gta_max_gap), 1),
            is_obb=self.is_obb,
            capacity=capacity,
        )
        if use_cmc:
            from boxmot_tpu.motion.cmc import create_cmc

            self.cmc = create_cmc(cmc_method)
        else:
            self.cmc = None
        self._pending = {}

    def _init_state(self):
        return init_state(self.cfg)

    def _set_detection_mode(self, is_obb: bool):
        super()._set_detection_mode(is_obb)
        self.cfg = dataclasses.replace(self.cfg, is_obb=is_obb)

    def update(self, dets, img=None, embs=None, masks=None):
        self._pending = {"img": img, "embs": embs}
        return super().update(dets, img, embs, masks)

    def flush_gta(self) -> np.ndarray:
        """Gap-fill rows accumulated by online GTA (reference flush_gta,
        consumed by the tracking workflow at sequence end)."""
        if self._state is None:
            return np.empty((0, 9))
        rows = flush_gta_rows(self._state, self.gta_smooth_tau)
        self._state = self._state.replace(
            gap_count=jnp.asarray(0, jnp.int32),
            g_valid=jnp.zeros_like(self._state.g_valid),
        )
        return rows

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
                boxes = np.asarray(dets_padded)[:n, : 5 if self.cfg.is_obb else 4]
                if self.cfg.is_obb:
                    # ReID crops use enclosing AABBs in the OBB path
                    # (_xywha_to_xyxy_enclosing, occluboost.py:44-60)
                    from boxmot_tpu.trackers.botsort import BotSort

                    boxes = BotSort._obb_hull_np(boxes)
                emb_pad[:n] = self.model.get_features(boxes, img)
        if self.cmc is not None and img is not None and not self.cfg.is_obb:
            warp = self.cmc.apply(img, np.asarray(dets_padded)[:n, :4])
        else:
            warp = IDENTITY_WARP
        return occluboost_step(
            self.cfg,
            state,
            dets_padded,
            det_valid,
            jnp.asarray(emb_pad),
            jnp.asarray(warp, jnp.float32),
        )
