"""DeepOcSort as a fixed-capacity struct-of-arrays XLA program.

Re-design of the reference DeepOcSort
(boxmot/trackers/bbox/deepocsort/deepocsort.py:17-492): OC-SORT's
observation-centric machinery (XYSR filter, velocity-direction cost,
OCR, ORU) plus appearance:

  * pass-1 cost adds an embedding term: emb_cost = dets_embs @ trk_embs^T
    zeroed where iou <= 0, scaled by the adaptive-weighting scheme
    (compute_aw_max_metric, association/association.py:29-58) or a fixed
    w_association_emb;
  * track embeddings update by EMA with a confidence-dependent alpha:
    trust = (conf - det_thresh)/(1 - det_thresh),
    alpha = alpha_fixed_emb + (1 - alpha_fixed_emb)(1 - trust)
    (deepocsort.py:357-361);
  * camera-motion warp applied to the KF state, the frozen ORU snapshot,
    the last observation and the observation ring (deepocsort.py:189-207);
  * detections below det_thresh are discarded (no BYTE pass); OCR runs
    IoU-only; track ids start at 1 and are emitted without offset.

Padding note: the adaptive weighting's "second best" can see a padded
zero column when every real similarity is negative for a row; real
same-object similarities are positive so this does not matter in
practice.
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
from boxmot_tpu.ops.geometry import xysr2xyxy, xyxy2xysr
from boxmot_tpu.ops.iou import get_asso_func
from boxmot_tpu.trackers.base import BaseTracker
from boxmot_tpu.trackers.botsort import IDENTITY_WARP
from boxmot_tpu.trackers.ocsort import (
    MAX_ORU,
    _full_assignment,
    _speed_direction,
    _unique_shortcut,
)


@dataclasses.dataclass(frozen=True)
class DeepOcSortConfig:
    det_thresh: float = 0.3
    max_age: int = 30
    min_hits: int = 3
    iou_threshold: float = 0.3
    delta_t: int = 3
    inertia: float = 0.2
    w_association_emb: float = 0.5
    alpha_fixed_emb: float = 0.95
    aw_param: float = 0.5
    embedding_off: bool = False
    aw_off: bool = False
    q_xy_scaling: float = 0.01
    q_s_scaling: float = 0.0001
    asso_func: str = "iou"
    frame_w: float = 0.0  # set from the first img for centroid asso
    frame_h: float = 0.0
    feat_dim: int = 512
    capacity: int = 256


@struct.dataclass
class DeepOcSortState:
    mean: jax.Array
    cov: jax.Array
    active: jax.Array
    age: jax.Array
    tsu: jax.Array
    hits: jax.Array
    hit_streak: jax.Array
    tid: jax.Array
    conf: jax.Array
    cls: jax.Array
    det_ind: jax.Array
    last_obs: jax.Array  # (K, 5)
    has_obs: jax.Array
    obs_ring: jax.Array  # (K, R, 5)
    ring_age: jax.Array
    velocity: jax.Array
    observed: jax.Array
    frozen_mean: jax.Array
    frozen_cov: jax.Array
    last_meas: jax.Array
    emb: jax.Array  # (K, F)
    frame_count: jax.Array
    next_id: jax.Array


def init_state(cfg: DeepOcSortConfig) -> DeepOcSortState:
    K, R, F = cfg.capacity, cfg.delta_t, cfg.feat_dim
    return DeepOcSortState(
        mean=jnp.zeros((K, 7), jnp.float32),
        cov=jnp.zeros((K, 7, 7), jnp.float32),
        active=jnp.zeros((K,), bool),
        age=jnp.zeros((K,), jnp.int32),
        tsu=jnp.zeros((K,), jnp.int32),
        hits=jnp.zeros((K,), jnp.int32),
        hit_streak=jnp.zeros((K,), jnp.int32),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        last_obs=jnp.full((K, 5), -1.0, jnp.float32),
        has_obs=jnp.zeros((K,), bool),
        obs_ring=jnp.full((K, R, 5), -1.0, jnp.float32),
        ring_age=jnp.full((K, R), -1, jnp.int32),
        velocity=jnp.zeros((K, 2), jnp.float32),
        observed=jnp.zeros((K,), bool),
        frozen_mean=jnp.zeros((K, 7), jnp.float32),
        frozen_cov=jnp.zeros((K, 7, 7), jnp.float32),
        last_meas=jnp.zeros((K, 4), jnp.float32),
        emb=jnp.zeros((K, F), jnp.float32),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
    )


def aw_max_metric(emb_cost, w_emb_const, bottom, valid_rows, valid_cols):
    """Adaptive weighting (association.py:29-58), vectorized with top-2."""
    masked = jnp.where(valid_rows[:, None] & valid_cols[None, :], emb_cost, 0.0)

    def weights(mat):
        top2 = jax.lax.top_k(mat, 2)[0]  # (N, 2)
        first, second = top2[:, 0], top2[:, 1]
        ratio = jnp.where(first != 0, second / jnp.where(first == 0, 1.0, first), 0.0)
        w = 1.0 - jnp.clip((ratio - bottom), 0.0) / (1.0 - bottom)
        return jnp.where(first == 0, 0.0, w)

    row_w = weights(masked)
    col_w = weights(masked.T)
    return w_emb_const * row_w[:, None] * col_w[None, :] * emb_cost


def _apply_affine(state_boxes, warp):
    """Warp (N, 4) xyxy boxes: both corner points through the affine."""
    m = warp[:2, :2]
    t = warp[:2, 2]
    p1 = state_boxes[:, :2] @ m.T + t
    p2 = state_boxes[:, 2:4] @ m.T + t
    return jnp.concatenate([p1, p2], axis=-1)


@partial(tracker_jit, static_argnames=("cfg",))
def deepocsort_step(cfg: DeepOcSortConfig, state: DeepOcSortState, dets, det_valid, embs, warp):
    layout = kalman.make_xysr_layout(
        q_xy_scaling=cfg.q_xy_scaling, q_s_scaling=cfg.q_s_scaling
    )
    asso = get_asso_func(cfg.asso_func, cfg.frame_w or None, cfg.frame_h or None)
    K, D, R = cfg.capacity, dets.shape[0], cfg.delta_t
    frame = state.frame_count + 1

    conf = dets[:, 4]
    first = det_valid & (conf > cfg.det_thresh)
    det_box = dets[:, :4]
    det_xysr = xyxy2xysr(det_box)
    det_xysr = det_xysr.at[:, 2].set(jnp.maximum(det_xysr[:, 2], 1e-6))
    det_xysr = det_xysr.at[:, 3].set(jnp.maximum(det_xysr[:, 3], 1e-6))

    det_emb = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-12)
    trust = (conf - cfg.det_thresh) / (1.0 - cfg.det_thresh)
    det_alpha = cfg.alpha_fixed_emb + (1 - cfg.alpha_fixed_emb) * (1 - trust)

    active = state.active

    # --- CMC before predict (deepocsort.py:351-355)
    m2 = warp[:2, :2]
    t2 = warp[:2, 2]
    last_obs = state.last_obs
    warped_lo = _apply_affine(last_obs[:, :4], warp)
    last_obs = jnp.where(
        (active & state.has_obs)[:, None],
        jnp.concatenate([warped_lo, last_obs[:, 4:5]], axis=-1),
        last_obs,
    )
    ring_boxes = _apply_affine(state.obs_ring.reshape(-1, 5)[:, :4], warp).reshape(
        K, R, 4
    )
    obs_ring = jnp.where(
        (active[:, None] & (state.ring_age >= 0))[..., None],
        jnp.concatenate([ring_boxes, state.obs_ring[..., 4:5]], axis=-1),
        state.obs_ring,
    )

    def warp_kf(mean, cov, mask):
        # apply_affine_correction (xysr.py:312-336): position + velocity
        # rotated, s/r untouched.
        pos = mean[:, :2] @ m2.T + t2
        vel = mean[:, 4:6] @ m2.T
        new_mean = mean.at[:, :2].set(pos).at[:, 4:6].set(vel)
        T = jnp.eye(7, dtype=mean.dtype)
        T = T.at[:2, :2].set(m2).at[4:6, 4:6].set(m2)
        TC = jnp.einsum("ab,kbc->kac", T, cov)
        new_cov = jnp.einsum("kac,bc->kab", TC, T)
        mm = mask[:, None]
        return jnp.where(mm, new_mean, mean), jnp.where(mm[..., None], new_cov, cov)

    mean, cov = warp_kf(state.mean, state.cov, active)
    frozen_mean, frozen_cov = warp_kf(state.frozen_mean, state.frozen_cov, active)

    # --- predict
    vs_bad = (mean[:, 6] + mean[:, 2]) <= 0
    mean = mean.at[:, 6].set(jnp.where(vs_bad, 0.0, mean[:, 6]))
    mean, cov = kalman.predict(layout, mean, cov, active)
    age = state.age + active.astype(jnp.int32)
    hit_streak = jnp.where(active & (state.tsu > 0), 0, state.hit_streak)
    tsu = state.tsu + active.astype(jnp.int32)

    trk_box = xysr2xyxy(mean[:, :4])

    # --- k_previous_obs
    k_obs = last_obs
    found = jnp.zeros((K,), bool)
    for i in range(cfg.delta_t):
        dt = cfg.delta_t - i
        target = age - dt
        slot = jnp.clip(target % R, 0, R - 1)
        hit = (state.ring_age[jnp.arange(K), slot] == target) & (target >= 0)
        take = hit & ~found
        k_obs = jnp.where(take[:, None], obs_ring[jnp.arange(K), slot], k_obs)
        found = found | hit

    # --- pass 1 with embedding cost
    iou1 = asso(trk_box, det_box)
    Y, X = _speed_direction(k_obs[:, :4], det_box)
    diff_cos = jnp.clip(
        state.velocity[:, 1:2] * X + state.velocity[:, 0:1] * Y, -1.0, 1.0
    )
    diff_angle = (jnp.pi / 2.0 - jnp.abs(jnp.arccos(diff_cos))) / jnp.pi
    valid_vel = (k_obs[:, 4] >= 0)[:, None]
    angle_cost = valid_vel * diff_angle * cfg.inertia * conf[None, :]

    if cfg.embedding_off:
        emb_cost = jnp.zeros((K, D), jnp.float32)
    else:
        emb_cost = state.emb @ det_emb.T  # (K, D)
        emb_cost = jnp.where(iou1 <= 0, 0.0, emb_cost)
        if cfg.aw_off:
            emb_cost = emb_cost * cfg.w_association_emb
        else:
            emb_cost = aw_max_metric(
                emb_cost, cfg.w_association_emb, cfg.aw_param, active, first
            )

    usable, r2c_short = _unique_shortcut(iou1, active, first, cfg.iou_threshold)
    r2c_full = _full_assignment(-(iou1 + angle_cost + emb_cost), active, first)
    r2c1 = jnp.where(usable, r2c_short, r2c_full)
    keep1 = (r2c1 >= 0) & (
        iou1[jnp.arange(K), jnp.clip(r2c1, 0, D - 1)] >= cfg.iou_threshold
    )
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

    # --- OCR (iou only, deepocsort.py:425-460)
    rows3 = active & ~matched
    cols3 = first & ~dm
    iou3 = asso(last_obs[:, :4], det_box)
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

    # --- ORU replay (same machinery as OC-SORT)
    rejoin = matched & ~state.observed & state.has_obs & (tsu > 1)
    mean = jnp.where(rejoin[:, None], frozen_mean, mean)
    cov = jnp.where(rejoin[:, None, None], frozen_cov, cov)
    gap = tsu
    z2 = det_xysr[c]
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
    def _oru_body(i, carry):
        mean, cov = carry
        act_i = rejoin & (i <= gap)
        pmean_i, pcov_i = kalman.predict(layout, mean, cov, act_i)
        mean = jnp.where(i > 1, pmean_i, mean)
        cov = jnp.where(i > 1, pcov_i, cov)
        fi = i.astype(jnp.float32)
        xi = m1_[:, 0] + fi * dx
        yi = m1_[:, 1] + fi * dy
        wi = w1 + fi * dw
        hi = h1 + fi * dh
        zi = jnp.stack(
            [
                xi,
                yi,
                jnp.maximum(wi * hi, 1e-6),
                jnp.maximum(wi / jnp.maximum(hi, 1e-12), 1e-6),
            ],
            axis=-1,
        )
        return kalman.update(layout, mean, cov, zi, jnp.zeros((K,), jnp.float32), act_i)

    def _oru_replay(carry):
        n_steps = jnp.minimum(jnp.max(jnp.where(rejoin, gap, 0)), MAX_ORU).astype(
            jnp.int32
        )
        return jax.lax.fori_loop(jnp.int32(1), n_steps + 1, _oru_body, carry)

    # rejoin-free frames skip the whole replay (single-branch XLA cond)
    mean, cov = jax.lax.cond(
        jnp.any(rejoin), _oru_replay, lambda carry: carry, (mean, cov)
    )

    mean, cov = kalman.update(
        layout, mean, cov, z2, jnp.zeros((K,), jnp.float32), matched
    )

    # --- EMA embedding with per-det alpha (deepocsort.py:182-185)
    a = det_alpha[c][:, None]
    new_emb = a * state.emb + (1 - a) * det_emb[c]
    new_emb = new_emb / jnp.maximum(jnp.linalg.norm(new_emb, axis=-1, keepdims=True), 1e-12)
    emb = jnp.where(matched[:, None], new_emb, state.emb)

    # --- bookkeeping
    dy_v, dx_v = _speed_direction(k_obs[:, :4], det_box)
    vel_new = jnp.stack([dy_v[jnp.arange(K), c], dx_v[jnp.arange(K), c]], axis=-1)
    set_vel = matched & state.has_obs
    velocity = jnp.where(set_vel[:, None], vel_new, state.velocity)

    new_obs = jnp.concatenate([det_box[c], conf[c][:, None]], axis=-1)
    last_obs = jnp.where(matched[:, None], new_obs, last_obs)
    slot = jnp.clip(age % R, 0, R - 1)
    obs_ring = jnp.where(
        matched[:, None, None],
        obs_ring.at[jnp.arange(K), slot].set(new_obs),
        obs_ring,
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
    cls_s = jnp.where(matched, dets[:, 5][c], state.cls)
    det_ind_s = jnp.where(matched, dets[:, 6][c], state.det_ind)
    tsu = jnp.where(matched, 0, tsu)

    miss = active & ~matched
    first_miss = miss & state.observed
    frozen_mean = jnp.where(first_miss[:, None], mean, frozen_mean)
    frozen_cov = jnp.where(first_miss[:, None, None], cov, frozen_cov)
    observed = jnp.where(active, matched, state.observed)

    # --- new tracks
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

    init_mean_v, init_cov_v = kalman.initiate(layout, det_xysr[slot_det])
    mean = jnp.where(takes[:, None], init_mean_v, mean)
    cov = jnp.where(takes[:, None, None], init_cov_v, cov)
    active = active | takes
    tid = jnp.where(takes, state.next_id + free_rank, state.tid)
    conf_s = jnp.where(takes, conf[slot_det], conf_s)
    cls_s = jnp.where(takes, dets[:, 5][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, 6][slot_det], det_ind_s)
    age = jnp.where(takes, 0, age)
    tsu = jnp.where(takes, 0, tsu)
    hits = jnp.where(takes, 0, hits)
    hit_streak = jnp.where(takes, 0, hit_streak)
    has_obs = jnp.where(takes, False, has_obs)
    observed = jnp.where(takes, False, observed)
    velocity = jnp.where(takes[:, None], 0.0, velocity)
    last_obs = jnp.where(takes[:, None], -1.0, last_obs)
    ring_age = jnp.where(takes[:, None], -1, ring_age)
    emb = jnp.where(takes[:, None], det_emb[slot_det], emb)

    dead = active & (tsu > cfg.max_age)
    active = active & ~dead

    out_box = jnp.where(has_obs[:, None], last_obs[:, :4], xysr2xyxy(mean[:, :4]))
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

    new_state = DeepOcSortState(
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
        emb=emb,
        frame_count=frame,
        next_id=state.next_id + n_new,
    )
    return new_state, out, out_mask


class DeepOcSort(BaseTracker):
    """Host wrapper mirroring the reference constructor (deepocsort.py:263-301)."""

    supports_obb = False

    def __init__(
        self,
        reid_model=None,
        delta_t: int = 3,
        inertia: float = 0.2,
        w_association_emb: float = 0.5,
        alpha_fixed_emb: float = 0.95,
        aw_param: float = 0.5,
        embedding_off: bool = False,
        cmc_off: bool = False,
        aw_off: bool = False,
        Q_xy_scaling: float = 0.01,
        Q_s_scaling: float = 0.0001,
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.model = reid_model
        feat_dim = getattr(reid_model, "feature_dim", 512) if reid_model else 512
        self.cfg = DeepOcSortConfig(
            det_thresh=self.det_thresh,
            max_age=self.max_age,
            min_hits=self.min_hits,
            iou_threshold=self.iou_threshold,
            delta_t=delta_t,
            inertia=inertia,
            w_association_emb=w_association_emb,
            alpha_fixed_emb=alpha_fixed_emb,
            aw_param=aw_param,
            embedding_off=embedding_off,
            aw_off=aw_off,
            q_xy_scaling=Q_xy_scaling,
            q_s_scaling=Q_s_scaling,
            asso_func=self.asso_func_name,
            feat_dim=feat_dim if not embedding_off else 1,
            capacity=capacity,
        )
        if not cmc_off:
            from boxmot_tpu.motion.cmc import create_cmc

            # reference uses sparse optical flow; the native CMC stack
            # provides ECC (same role: frame-to-frame ego motion).
            self.cmc = create_cmc("ecc")
        else:
            self.cmc = None
        self._pending = {}

    def _init_state(self):
        return init_state(self.cfg)

    def _set_frame_size(self, w: float, h: float):
        import dataclasses

        if self.cfg.asso_func == "centroid":
            self.cfg = dataclasses.replace(self.cfg, frame_w=w, frame_h=h)

    def update(self, dets, img=None, embs=None, masks=None):
        self._pending = {"img": img, "embs": embs}
        return super().update(dets, img, embs, masks)

    def _step(self, state, dets_padded, det_valid):
        import jax.numpy as jnp

        D = dets_padded.shape[0]
        F = self.cfg.feat_dim
        emb_pad = np.zeros((D, F), np.float32)
        n = int(np.asarray(det_valid).sum())
        embs = self._pending.get("embs")
        img = self._pending.get("img")
        if not self.cfg.embedding_off and n:
            if embs is not None:
                emb_pad[:n] = np.asarray(embs, np.float32)[:n]
            elif self.model is not None and img is not None:
                emb_pad[:n] = self.model.get_features(
                    np.asarray(dets_padded)[:n, :4], img
                )
            else:
                emb_pad[:n] = 1.0  # reference uses ones when no model
        if self.cmc is not None and img is not None:
            warp = self.cmc.apply(img, np.asarray(dets_padded)[:n, :4])
        else:
            warp = IDENTITY_WARP
        return deepocsort_step(
            self.cfg,
            state,
            dets_padded,
            det_valid,
            jnp.asarray(emb_pad),
            jnp.asarray(warp, jnp.float32),
        )
