"""StrongSort as a fixed-capacity struct-of-arrays XLA program.

Re-design of the reference StrongSort (boxmot/trackers/bbox/strongsort/:
strongsort.py, sort/tracker.py, sort/linear_assignment.py, sort/track.py,
strongsort_kf.py): the DeepSORT lineage with the NSA Kalman filter
(measurement noise scaled by 1 - detection confidence), EMA appearance
with a per-track feature *bank* (nn_budget samples, min-cosine distance),
motion-fused appearance matching, and an IoU pass for tentative/fresh
tracks.

Semantics preserved:
  * pass 1 (confirmed tracks): cost = mc_lambda * min-cosine-over-bank +
    (1 - mc_lambda) * Mahalanobis gating distance, INF where the gating
    distance exceeds chi2(4); entries above max_cos_dist clamped out;
    full assignment then threshold filter  (linear_assignment.py:14-198)
  * pass 2: tentative tracks + confirmed tracks missed exactly one frame,
    IoU cost with rows of older tracks invalidated (iou_matching.py:49-88)
  * track lifecycle: Tentative until n_init hits, missed tentative tracks
    die immediately, confirmed tracks expire after max_age
  * the appearance bank receives every confirmed track's current EMA
    feature each frame (tracker.py:97-107 partial_fit) — including missed
    frames, exactly like the reference
  * camera update rebuilds the state from warped corners (track.py:137-147)
  * outputs are KF state boxes of confirmed, just-updated tracks
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
from boxmot_tpu.ops.iou import iou_batch
from boxmot_tpu.trackers.base import BaseTracker
from boxmot_tpu.trackers.botsort import IDENTITY_WARP
from boxmot_tpu.trackers.ocsort import _full_assignment

EMPTY, TENTATIVE, CONFIRMED = 0, 1, 2
INFTY = 1e5
CHI2_4 = 9.4877


@dataclasses.dataclass(frozen=True)
class StrongSortConfig:
    min_conf: float = 0.1
    max_cos_dist: float = 0.2
    max_iou_dist: float = 0.7
    max_age: int = 30
    n_init: int = 3
    nn_budget: int = 100
    mc_lambda: float = 0.98
    ema_alpha: float = 0.9
    feat_dim: int = 512
    capacity: int = 256
    # KF noise scales; override with tune-kf estimates (motion/calibration.py)
    std_weight_position: float = 1.0 / 20
    std_weight_velocity: float = 1.0 / 160


@struct.dataclass
class StrongSortState:
    mean: jax.Array  # (K, 8) xyah
    cov: jax.Array
    status: jax.Array
    hits: jax.Array
    age: jax.Array
    tsu: jax.Array
    tid: jax.Array
    conf: jax.Array
    cls: jax.Array
    det_ind: jax.Array
    smooth: jax.Array  # (K, F) EMA feature
    has_feat: jax.Array
    bank: jax.Array  # (K, B, F)
    bank_count: jax.Array  # (K,)
    frame_count: jax.Array
    next_id: jax.Array


def init_state(cfg: StrongSortConfig) -> StrongSortState:
    K, B, F = cfg.capacity, cfg.nn_budget, cfg.feat_dim
    return StrongSortState(
        mean=jnp.zeros((K, 8), jnp.float32),
        cov=jnp.zeros((K, 8, 8), jnp.float32),
        status=jnp.zeros((K,), jnp.int32),
        hits=jnp.zeros((K,), jnp.int32),
        age=jnp.zeros((K,), jnp.int32),
        tsu=jnp.zeros((K,), jnp.int32),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        smooth=jnp.zeros((K, F), jnp.float32),
        has_feat=jnp.zeros((K,), bool),
        bank=jnp.zeros((K, B, F), jnp.float32),
        bank_count=jnp.zeros((K,), jnp.int32),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
    )


@partial(tracker_jit, static_argnames=("cfg",))
def strongsort_step(cfg: StrongSortConfig, state: StrongSortState, dets, det_valid, embs, warp):
    layout = kalman.make_xyah_layout(
        nsa=True,
        std_weight_position=cfg.std_weight_position,
        std_weight_velocity=cfg.std_weight_velocity,
    )
    K, D = cfg.capacity, dets.shape[0]
    B = cfg.nn_budget
    frame = state.frame_count + 1
    status0 = state.status
    alive = status0 != EMPTY
    confirmed = status0 == CONFIRMED
    tentative = status0 == TENTATIVE

    conf = dets[:, 4]
    valid = det_valid & (conf >= cfg.min_conf)
    det_box = dets[:, :4]
    det_xyah = xyxy2xyah(det_box)
    feat = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-12)

    # --- camera update (track.py:137-147) then predict
    m = warp[:2, :2]
    t = warp[:2, 2]
    tb = xyah2xyxy(state.mean[:, :4])
    p1 = tb[:, :2] @ m.T + t
    p2 = tb[:, 2:] @ m.T + t
    w = p2[:, 0] - p1[:, 0]
    h = p2[:, 1] - p1[:, 1]
    warped = jnp.stack(
        [p1[:, 0] + w / 2, p1[:, 1] + h / 2, w / jnp.maximum(h, 1e-6), h], axis=-1
    )
    mean = state.mean.at[:, :4].set(
        jnp.where(alive[:, None], warped, state.mean[:, :4])
    )
    mean, cov = kalman.predict(layout, mean, state.cov, alive)
    age = state.age + alive.astype(jnp.int32)
    tsu = state.tsu + alive.astype(jnp.int32)

    # --- pass 1: confirmed tracks, appearance bank + motion fusion
    bank_valid = jnp.arange(B)[None, :] < jnp.minimum(state.bank_count, B)[:, None]
    sims = jnp.einsum("kbf,df->kbd", state.bank, feat)  # (K, B, D)
    cos_d = 1.0 - sims
    cos_d = jnp.where(bank_valid[:, :, None], cos_d, jnp.inf)
    app_cost = jnp.min(cos_d, axis=1)  # (K, D)
    app_cost = jnp.where(jnp.isfinite(app_cost), app_cost, INFTY)

    gate = kalman.gating_distance(layout, mean, cov, det_xyah)  # (K, D)
    cost1 = jnp.where(gate > CHI2_4, INFTY, app_cost)
    cost1 = cfg.mc_lambda * cost1 + (1 - cfg.mc_lambda) * gate
    cost1 = jnp.minimum(cost1, cfg.max_cos_dist + 1e-5)

    rows1 = confirmed
    r2c1 = _full_assignment(cost1, rows1, valid)
    c1 = jnp.clip(r2c1, 0, D - 1)
    keep1 = (r2c1 >= 0) & (cost1[jnp.arange(K), c1] <= cfg.max_cos_dist)
    m1 = keep1
    dm = jnp.zeros((D,), bool).at[jnp.where(m1, r2c1, D)].set(True, mode="drop")

    # --- pass 2: tentative + confirmed-missed-one-frame, IoU
    rows2 = (tentative | (confirmed & ~m1 & (tsu == 1))) & alive
    trk_tlbr = xyah2xyxy(mean[:, :4])
    iou_c = 1.0 - iou_batch(trk_tlbr, det_box)
    iou_c = jnp.where((tsu > 1)[:, None], INFTY, iou_c)
    iou_c = jnp.minimum(iou_c, cfg.max_iou_dist + 1e-5)
    r2c2 = _full_assignment(iou_c, rows2, valid & ~dm)
    c2 = jnp.clip(r2c2, 0, D - 1)
    keep2 = (r2c2 >= 0) & (iou_c[jnp.arange(K), c2] <= cfg.max_iou_dist)
    m2 = keep2
    dm = dm.at[jnp.where(m2, r2c2, D)].set(True, mode="drop")

    matched = m1 | m2
    c = jnp.where(m1, c1, c2)
    c = jnp.clip(c, 0, D - 1)

    # --- NSA KF update with detection confidence (strongsort_kf project)
    mean, cov = kalman.update(layout, mean, cov, det_xyah[c], conf[c], matched)
    f = feat[c]
    sm = cfg.ema_alpha * state.smooth + (1 - cfg.ema_alpha) * f
    sm = sm / jnp.maximum(jnp.linalg.norm(sm, axis=-1, keepdims=True), 1e-12)
    new_smooth = jnp.where(state.has_feat[:, None], sm, f)
    smooth = jnp.where(matched[:, None], new_smooth, state.smooth)
    has_feat = state.has_feat | matched

    hits = state.hits + matched.astype(jnp.int32)
    tsu = jnp.where(matched, 0, tsu)
    conf_s = jnp.where(matched, conf[c], state.conf)
    cls_s = jnp.where(matched, dets[:, 5][c], state.cls)
    det_ind_s = jnp.where(matched, dets[:, 6][c], state.det_ind)
    status = jnp.where(
        tentative & matched & (hits >= cfg.n_init), CONFIRMED, status0
    )

    # --- mark_missed (track.py:189-194)
    missed = alive & ~matched
    status = jnp.where(missed & tentative, EMPTY, status)
    status = jnp.where(missed & confirmed & (tsu > cfg.max_age), EMPTY, status)

    # --- new tracks from unmatched detections
    new_det = valid & ~dm
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

    init_mean_v, init_cov_v = kalman.initiate(layout, det_xyah[slot_det])
    mean = jnp.where(takes[:, None], init_mean_v, mean)
    cov = jnp.where(takes[:, None, None], init_cov_v, cov)
    status = jnp.where(takes, TENTATIVE, status)
    tid = jnp.where(takes, state.next_id + free_rank, state.tid)
    conf_s = jnp.where(takes, conf[slot_det], conf_s)
    cls_s = jnp.where(takes, dets[:, 5][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, 6][slot_det], det_ind_s)
    hits = jnp.where(takes, 1, hits)
    age = jnp.where(takes, 1, age)
    tsu = jnp.where(takes, 0, tsu)
    smooth = jnp.where(takes[:, None], feat[slot_det], smooth)
    has_feat = jnp.where(takes, True, has_feat)
    bank_count = jnp.where(takes, 0, state.bank_count)

    # --- appearance bank partial_fit (tracker.py:97-107): every confirmed
    # track appends its current EMA feature each frame; others keep none.
    # The bank is a most-recent-B sample set consumed only through a
    # min-distance reduction, so push-front + drop-last keeps exactly the
    # reference's retained set — expressed as a concatenate (pure
    # elementwise data movement XLA fuses) instead of a per-row dynamic
    # scatter, which lowers catastrophically on TPU (measured: the
    # scatter formulation capped the whole replay at 19.6 fps; this one
    # runs the same program at ~700 fps).
    is_conf = status == CONFIRMED
    pushed = jnp.concatenate([smooth[:, None, :], state.bank[:, :-1, :]], axis=1)
    bank = jnp.where(is_conf[:, None, None], pushed, state.bank)
    bank_count = jnp.where(is_conf, bank_count + 1, 0)

    out_box = xyah2xyxy(mean[:, :4])
    out_mask = is_conf & (tsu < 1)
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

    new_state = StrongSortState(
        mean=mean,
        cov=cov,
        status=status,
        hits=hits,
        age=age,
        tsu=tsu,
        tid=tid,
        conf=conf_s,
        cls=cls_s,
        det_ind=det_ind_s,
        smooth=smooth,
        has_feat=has_feat,
        bank=bank,
        bank_count=bank_count,
        frame_count=frame,
        next_id=state.next_id + n_new,
    )
    return new_state, out, out_mask


class StrongSort(BaseTracker):
    """Host wrapper mirroring the reference constructor (strongsort.py:41-69)."""

    supports_obb = False

    def __init__(
        self,
        reid_model=None,
        min_conf: float = 0.1,
        max_cos_dist: float = 0.2,
        max_iou_dist: float = 0.7,
        n_init: int = 3,
        nn_budget: int = 100,
        mc_lambda: float = 0.98,
        ema_alpha: float = 0.9,
        std_weight_position: float = 1.0 / 20,
        std_weight_velocity: float = 1.0 / 160,
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.model = reid_model
        feat_dim = getattr(reid_model, "feature_dim", 512) if reid_model else 512
        self.cfg = StrongSortConfig(
            min_conf=min_conf,
            max_cos_dist=max_cos_dist,
            max_iou_dist=max_iou_dist,
            max_age=self.max_age,
            n_init=n_init,
            nn_budget=nn_budget,
            mc_lambda=mc_lambda,
            ema_alpha=ema_alpha,
            feat_dim=feat_dim,
            std_weight_position=std_weight_position,
            std_weight_velocity=std_weight_velocity,
            capacity=capacity,
        )
        from boxmot_tpu.motion.cmc import create_cmc

        self.cmc = create_cmc("ecc")
        self._pending = {}

    def _init_state(self):
        return init_state(self.cfg)

    def update(self, dets, img=None, embs=None, masks=None):
        self._pending = {"img": img, "embs": embs}
        return super().update(dets, img, embs, masks)

    def _lost_mask(self, state):
        # alive slots missed this frame (show_kf_preds overlays)
        return (np.asarray(state.status) != EMPTY) & (np.asarray(state.tsu) > 0)

    def _step(self, state, dets_padded, det_valid):
        import jax.numpy as jnp

        D = dets_padded.shape[0]
        F = self.cfg.feat_dim
        emb_pad = np.ones((D, F), np.float32)
        n = int(np.asarray(det_valid).sum())
        embs = self._pending.get("embs")
        img = self._pending.get("img")
        if n:
            if embs is not None:
                emb_pad[:n] = np.asarray(embs, np.float32)[:n]
            elif self.model is not None and img is not None:
                emb_pad[:n] = self.model.get_features(
                    np.asarray(dets_padded)[:n, :4], img
                )
        if self.cmc is not None and img is not None:
            warp = self.cmc.apply(img, np.asarray(dets_padded)[:n, :4])
        else:
            warp = IDENTITY_WARP
        return strongsort_step(
            self.cfg,
            state,
            dets_padded,
            det_valid,
            jnp.asarray(emb_pad),
            jnp.asarray(warp, jnp.float32),
        )
