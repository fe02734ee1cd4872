"""BoT-SORT as a fixed-capacity struct-of-arrays XLA program.

Re-design of the reference BotSort
(boxmot/trackers/bbox/botsort/botsort.py:20-500, botsort_track.py:12-325):
the ByteTrack two-stage skeleton on an XYWH Kalman filter, fused with
appearance embeddings and camera-motion compensation.

Semantics preserved:
  * first pass vs (activated + lost) pool:
      iou_dist masked at proximity_thresh; embedding distance
      (1 - cos(smooth_feat, det_feat)) clipped at appearance_thresh and
      masked by the IoU gate; cost = min(iou_dist, emb_dist); optional
      fuse_score (fuse_first_associate)        (botsort.py:285-321)
  * second pass: low-conf dets, IoU only, second_match_thresh
  * unconfirmed pass: fuse_score + emb/unconfirmed_emb_scale,
    unconfirmed_match_thresh                   (botsort.py:380-431)
  * new tracks gated at new_track_thresh
  * EMA appearance bank: smooth = 0.9 smooth + 0.1 feat, renormalized
    (botsort_track.py:58-67); second-stage dets carry no features
  * confidence-weighted class voting           (botsort_track.py:69-83)
  * camera-motion warp applied to pool + unconfirmed after predict:
    mean <- kron(I4, R) mean + t, cov <- T cov T^T (multi_gmc,
    botsort_track.py:118-133).  The warp matrix is an input to the step;
    estimation (ECC et al.) lives in boxmot_tpu.motion.cmc.
  * lost-track expiry and tracked/lost duplicate suppression as ByteTrack
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
from boxmot_tpu.ops.geometry import obb_corners, xywh2xyxy, xyxy2xywh
from boxmot_tpu.ops.iou import iou_batch, iou_batch_obb
from boxmot_tpu.ops.lap import masked_assignment
from boxmot_tpu.trackers.base import BaseTracker

EMPTY, TRACKED, LOST = 0, 1, 2

IDENTITY_WARP = np.eye(2, 3, dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class BotSortConfig:
    track_high_thresh: float = 0.5
    track_low_thresh: float = 0.1
    new_track_thresh: float = 0.6
    match_thresh: float = 0.8
    proximity_thresh: float = 0.5
    appearance_thresh: float = 0.25
    second_match_thresh: float = 0.5
    unconfirmed_match_thresh: float = 0.7
    unconfirmed_emb_scale: float = 2.0
    fuse_first_associate: bool = False
    with_reid: bool = True
    max_time_lost: int = 30
    feat_dim: int = 512
    nr_classes: int = 80
    ema_alpha: float = 0.9
    is_obb: bool = False  # oriented boxes: XYWH-5 filter + OBB-aware CMC
    # KF noise scales; override with tune-kf estimates (motion/calibration.py)
    std_weight_position: float = 1.0 / 20
    std_weight_velocity: float = 1.0 / 160
    capacity: int = 256


@struct.dataclass
class BotSortState:
    mean: jax.Array  # (K, 8) xywh + velocities
    cov: jax.Array  # (K, 8, 8)
    status: jax.Array
    activated: jax.Array
    tid: jax.Array
    conf: jax.Array
    cls: jax.Array
    det_ind: jax.Array
    frame_id: jax.Array
    start_frame: jax.Array
    tracklet_len: jax.Array
    smooth_feat: jax.Array  # (K, F) EMA appearance, L2-normalized
    has_feat: jax.Array  # (K,)
    cls_scores: jax.Array  # (K, NC) confidence-weighted votes
    cls_seen: jax.Array  # (K, NC)
    frame_count: jax.Array
    next_id: jax.Array


def init_state(cfg: BotSortConfig) -> BotSortState:
    K = cfg.capacity
    DX = 10 if cfg.is_obb else 8
    return BotSortState(
        mean=jnp.zeros((K, DX), jnp.float32),
        cov=jnp.zeros((K, DX, DX), jnp.float32),
        status=jnp.zeros((K,), jnp.int32),
        activated=jnp.zeros((K,), bool),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        frame_id=jnp.zeros((K,), jnp.int32),
        start_frame=jnp.zeros((K,), jnp.int32),
        tracklet_len=jnp.zeros((K,), jnp.int32),
        smooth_feat=jnp.zeros((K, cfg.feat_dim), jnp.float32),
        has_feat=jnp.zeros((K,), bool),
        cls_scores=jnp.zeros((K, cfg.nr_classes), jnp.float32),
        cls_seen=jnp.zeros((K, cfg.nr_classes), bool),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
    )


def _scatter_det_flags(r2c, matched, n_dets):
    idx = jnp.where(matched, r2c, n_dets)
    return jnp.zeros((n_dets,), bool).at[idx].set(True, mode="drop")


def _apply_warp(mean, cov, warp, mask):
    """multi_gmc (botsort_track.py:118-133): rotate/scale state+cov."""
    R = warp[:2, :2]
    t = warp[:2, 2]
    T = jnp.kron(jnp.eye(4, dtype=warp.dtype), R)  # (8, 8)
    new_mean = mean @ T.T
    new_mean = new_mean.at[:, 0].add(t[0])
    new_mean = new_mean.at[:, 1].add(t[1])
    TC = jnp.einsum("ab,kbc->kac", T, cov)
    new_cov = jnp.einsum("kac,bc->kab", TC, T)
    m = mask[:, None]
    return jnp.where(m, new_mean, mean), jnp.where(m[..., None], new_cov, cov)


def _apply_warp_obb(mean, cov, warp, mask):
    """OBB-aware CMC (multi_gmc_obb, botsort_track.py:197-231): warp the
    box corners, refit a rotated rect, align it to the pre-warp state,
    rotate position velocities, and scale size velocities.

    The reference refits with cv2.minAreaRect; under the similarity
    transforms ECC produces (translation/euclidean) the warped corners
    stay an exact rectangle, so a direct edge-vector fit is identical.
    """
    R = warp[:2, :2]
    t = warp[:2, 2]
    scale_x = jnp.maximum(jnp.linalg.norm(R[:, 0]), 1e-6)
    scale_y = jnp.maximum(jnp.linalg.norm(R[:, 1]), 1e-6)

    corners = obb_corners(mean[:, :5])  # (K, 4, 2) order: bl, tl, tr, br
    wc = corners @ R.T + t
    center = wc.mean(axis=1)
    wvec = wc[:, 2] - wc[:, 1]  # tl -> tr: width edge
    hvec = wc[:, 3] - wc[:, 2]  # tr -> br: height edge
    w = jnp.maximum(jnp.linalg.norm(wvec, axis=-1), 1e-4)
    h = jnp.maximum(jnp.linalg.norm(hvec, axis=-1), 1e-4)
    angle = jnp.arctan2(wvec[:, 1], wvec[:, 0])
    fitted = jnp.stack([center[:, 0], center[:, 1], w, h, angle], axis=-1)
    fitted = kalman.align_obb_to_ref(fitted, mean[:, :5])

    new_mean = mean.at[:, :5].set(fitted)
    new_mean = new_mean.at[:, 5:7].set(mean[:, 5:7] @ R.T)
    new_mean = new_mean.at[:, 7].set(mean[:, 7] * scale_x)
    new_mean = new_mean.at[:, 8].set(mean[:, 8] * scale_y)

    T = jnp.eye(10, dtype=warp.dtype)
    T = T.at[:2, :2].set(R)
    T = T.at[5:7, 5:7].set(R)
    T = T.at[2, 2].set(scale_x)
    T = T.at[3, 3].set(scale_y)
    T = T.at[7, 7].set(scale_x)
    T = T.at[8, 8].set(scale_y)
    TC = jnp.einsum("ab,kbc->kac", T, cov)
    new_cov = jnp.einsum("kac,bc->kab", TC, T)

    m = mask[:, None]
    return jnp.where(m, new_mean, mean), jnp.where(m[..., None], new_cov, cov)


def _vote_cls(cls_scores, cls_seen, cls_det, conf_det, apply_mask, nr_classes):
    """Confidence-weighted class voting (botsort_track.py:69-83)."""
    K = cls_scores.shape[0]
    ci = jnp.clip(cls_det.astype(jnp.int32), 0, nr_classes - 1)
    onehot = jax.nn.one_hot(ci, nr_classes, dtype=cls_scores.dtype)
    add = onehot * conf_det[:, None] * apply_mask[:, None]
    new_scores = cls_scores + add
    seen_before = cls_seen[jnp.arange(K), ci]
    new_seen = cls_seen | (onehot > 0) & apply_mask[:, None]
    voted = jnp.where(
        seen_before,
        jnp.argmax(new_scores, axis=1).astype(jnp.float32),
        cls_det,
    )
    return new_scores, new_seen, voted


@partial(tracker_jit, static_argnames=("cfg",))
def botsort_step(cfg: BotSortConfig, state: BotSortState, dets, det_valid, embs, warp):
    """One frame.  dets: (D, 7); embs: (D, F) appearance of each det
    (only first-stage rows are used); warp: (2, 3) camera-motion affine.
    """
    layout = kalman.make_xywh_layout(
        obb=cfg.is_obb,
        std_weight_position=cfg.std_weight_position,
        std_weight_velocity=cfg.std_weight_velocity,
    )
    K = cfg.capacity
    D = dets.shape[0]
    B = 5 if cfg.is_obb else 4  # box cols
    frame = state.frame_count + 1

    conf = dets[:, B]
    first = det_valid & (conf > cfg.track_high_thresh)
    second = det_valid & (conf > cfg.track_low_thresh) & (conf < cfg.track_high_thresh)

    status0 = state.status
    tracked_act = (status0 == TRACKED) & state.activated
    unconf = (status0 == TRACKED) & ~state.activated
    lost = status0 == LOST
    pool = tracked_act | lost

    # normalize det features (STrack.update_features first line)
    feat = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-12)

    # KF predict: lost tracks get size (+angle) velocities zeroed
    # (botsort_track.py:84-110)
    if cfg.is_obb:
        mean = state.mean.at[:, 7:10].set(
            jnp.where(lost[:, None], 0.0, state.mean[:, 7:10])
        )
    else:
        mean = state.mean.at[:, 6:8].set(
            jnp.where(lost[:, None], 0.0, state.mean[:, 6:8])
        )
    pmean, pcov = kalman.predict(layout, mean, state.cov, pool)

    # camera motion compensation on pool + unconfirmed
    if cfg.is_obb:
        pmean, pcov = _apply_warp_obb(pmean, pcov, warp, pool | unconf)
    else:
        pmean, pcov = _apply_warp(pmean, pcov, warp, pool | unconf)

    if cfg.is_obb:
        det_xywh = dets[:, :5]
        iou = iou_batch_obb(pmean[:, :5], det_xywh)  # (K, D)
    else:
        det_xyxy = dets[:, :4]
        det_xywh = xyxy2xywh(det_xyxy)
        trk_xyxy = xywh2xyxy(pmean[:, :4])
        iou = iou_batch(trk_xyxy, det_xyxy)  # (K, D)
    iou_dist = 1.0 - iou
    prox_mask = iou_dist > cfg.proximity_thresh

    if cfg.with_reid:
        emb_dist_raw = jnp.maximum(
            0.0, 1.0 - state.smooth_feat @ feat.T
        )  # (K, D) cosine distance
        # tracks without features should never win on appearance
        emb_dist_raw = jnp.where(state.has_feat[:, None], emb_dist_raw, 1.0)

    # --- pass 1
    cost1_iou = iou_dist
    if cfg.fuse_first_associate:
        cost1_iou = 1.0 - iou * conf[None, :]
    if cfg.with_reid:
        emb1 = jnp.where(emb_dist_raw > cfg.appearance_thresh, 1.0, emb_dist_raw)
        emb1 = jnp.where(prox_mask, 1.0, emb1)
        cost1 = jnp.minimum(cost1_iou, emb1)
    else:
        cost1 = cost1_iou
    r2c1 = masked_assignment(cost1, pool, first, cfg.match_thresh)
    m1 = r2c1 >= 0
    dm1 = _scatter_det_flags(r2c1, m1, D)

    # --- pass 2 (low-conf, IoU only)
    r_tracked = pool & ~m1 & (status0 == TRACKED)
    r2c2 = masked_assignment(iou_dist, r_tracked, second, cfg.second_match_thresh)
    m2 = r2c2 >= 0

    # --- unconfirmed pass
    u_first = first & ~dm1
    cost3_iou = 1.0 - iou * conf[None, :]  # fuse_score (botsort.py:397)
    if cfg.with_reid:
        emb3 = emb_dist_raw / cfg.unconfirmed_emb_scale
        emb3 = jnp.where(emb3 > cfg.appearance_thresh, 1.0, emb3)
        emb3 = jnp.where(prox_mask, 1.0, emb3)
        cost3 = jnp.minimum(cost3_iou, emb3)
    else:
        cost3 = cost3_iou
    r2c3 = masked_assignment(cost3, unconf, u_first, cfg.unconfirmed_match_thresh)
    m3 = r2c3 >= 0
    dm3 = _scatter_det_flags(r2c3, m3, D)

    # --- fused KF update for all matched slots
    matched = m1 | m2 | m3
    det_col = jnp.where(m1, r2c1, jnp.where(m2, r2c2, r2c3))
    c = jnp.clip(det_col, 0, D - 1)
    meas = det_xywh[c]
    if cfg.is_obb:
        # resolve the rotated-rect parameterization against the state
        # (KalmanFilterXYWH.update, xywh.py:162-186)
        meas = kalman.align_obb_to_ref(meas, pmean[:, :5])
    new_mean, new_cov = kalman.update(
        layout, pmean, pcov, meas, jnp.zeros((K,), jnp.float32), matched
    )
    if cfg.is_obb:
        # angular velocity damped x0.8 after every observed update
        new_mean = new_mean.at[:, 9].set(
            jnp.where(matched, new_mean[:, 9] * 0.8, new_mean[:, 9])
        )

    # --- appearance EMA for matched first-stage dets
    det_has_feat = first[c] if cfg.with_reid else jnp.zeros((D,), bool)[c]
    upd_feat = matched & det_has_feat
    f = feat[c]
    ema = cfg.ema_alpha * state.smooth_feat + (1 - cfg.ema_alpha) * f
    ema = ema / jnp.maximum(jnp.linalg.norm(ema, axis=-1, keepdims=True), 1e-12)
    new_smooth = jnp.where(state.has_feat[:, None], ema, f)
    smooth_feat = jnp.where(upd_feat[:, None], new_smooth, state.smooth_feat)
    has_feat = state.has_feat | upd_feat

    # --- bookkeeping
    was_tracked = status0 == TRACKED
    tracklet_len = jnp.where(
        matched, jnp.where(was_tracked, state.tracklet_len + 1, 0), state.tracklet_len
    )
    status = jnp.where(matched, TRACKED, status0)
    activated = state.activated | matched
    conf_s = jnp.where(matched, conf[c], state.conf)
    det_ind_s = jnp.where(matched, dets[:, B + 2][c], state.det_ind)
    frame_id = jnp.where(matched, frame, state.frame_id)
    cls_scores, cls_seen, voted = _vote_cls(
        state.cls_scores, state.cls_seen, dets[:, B + 1][c], conf[c], matched, cfg.nr_classes
    )
    cls_s = jnp.where(matched, voted, state.cls)

    # --- aged-out lost tracks
    aged = (status == LOST) & (frame - frame_id > cfg.max_time_lost)
    status = jnp.where(aged, EMPTY, status)

    # --- unmatched tracked -> lost; unmatched unconfirmed -> removed
    status = jnp.where(r_tracked & ~m2, LOST, status)
    status = jnp.where(unconf & ~m3, EMPTY, status)

    # --- new tracks
    new_det = u_first & ~dm3 & (conf >= cfg.new_track_thresh)
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

    init_mean_v, init_cov_v = kalman.initiate(layout, det_xywh[slot_det])
    new_mean = jnp.where(takes[:, None], init_mean_v, new_mean)
    new_cov = jnp.where(takes[:, None, None], init_cov_v, new_cov)
    status = jnp.where(takes, TRACKED, status)
    activated = jnp.where(takes, frame == 1, activated)
    tid = jnp.where(takes, state.next_id + free_rank, state.tid)
    conf_s = jnp.where(takes, conf[slot_det], conf_s)
    cls_s = jnp.where(takes, dets[:, B + 1][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, B + 2][slot_det], det_ind_s)
    frame_id = jnp.where(takes, frame, frame_id)
    start_frame = jnp.where(takes, frame, state.start_frame)
    tracklet_len = jnp.where(takes, 0, tracklet_len)
    # new-track feature + class vote (STrack.__init__:41-44)
    smooth_feat = jnp.where(
        (takes & first[slot_det] & cfg.with_reid)[:, None], feat[slot_det], smooth_feat
    )
    has_feat = jnp.where(takes, first[slot_det] & cfg.with_reid, has_feat)
    cls_scores = jnp.where(takes[:, None], 0.0, cls_scores)
    cls_seen = jnp.where(takes[:, None], False, cls_seen)
    cls_scores, cls_seen, _ = _vote_cls(
        cls_scores, cls_seen, dets[:, B + 1][slot_det], conf[slot_det], takes, cfg.nr_classes
    )

    # --- duplicate suppression (botsort_utils.remove_duplicate_stracks)
    if cfg.is_obb:
        out_box = new_mean[:, :5]  # xywha property (botsort_track.py:318-325)
        pair_iou = iou_batch_obb(out_box, out_box)
    else:
        out_box = xywh2xyxy(new_mean[:, :4])
        pair_iou = iou_batch(out_box, out_box)
    a_mask = status == TRACKED
    b_mask = status == LOST
    pair = ((1.0 - pair_iou) < 0.15) & a_mask[:, None] & b_mask[None, :]
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

    new_state = BotSortState(
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
        smooth_feat=smooth_feat,
        has_feat=has_feat,
        cls_scores=cls_scores,
        cls_seen=cls_seen,
        frame_count=frame,
        next_id=state.next_id + n_new,
    )
    return new_state, out, out_mask


class BotSort(BaseTracker):
    """Host wrapper with the reference constructor surface (botsort.py:68-118)."""

    supports_obb = True  # XYWH-5 filter + OBB-aware CMC (botsort.py:64)

    def __init__(
        self,
        reid_model=None,
        track_high_thresh: float = 0.5,
        track_low_thresh: float = 0.1,
        new_track_thresh: float = 0.6,
        track_buffer: int = 30,
        match_thresh: float = 0.8,
        proximity_thresh: float = 0.5,
        appearance_thresh: float = 0.25,
        use_cmc: bool = True,
        cmc_method: str = "ecc",
        frame_rate: int = 30,
        fuse_first_associate: bool = False,
        with_reid: bool = True,
        second_match_thresh: float = 0.5,
        unconfirmed_match_thresh: float = 0.7,
        unconfirmed_emb_scale: float = 2.0,
        removed_stracks_buffer: int = 100,
        std_weight_position: float = 1.0 / 20,
        std_weight_velocity: float = 1.0 / 160,
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        # Removed-track bookkeeping (reference botsort.py:93) is implicit in
        # the SoA design: dead slots are recycled, so the buffer size only
        # exists for constructor/API parity with the reference zoo configs.
        self.removed_stracks_buffer = int(removed_stracks_buffer)
        self.buffer_size = int(frame_rate / 30.0 * track_buffer)
        self.with_reid = with_reid
        self.model = reid_model if with_reid else None
        feat_dim = getattr(reid_model, "feature_dim", 512) if reid_model else 512
        self.cfg = BotSortConfig(
            track_high_thresh=track_high_thresh,
            track_low_thresh=track_low_thresh,
            new_track_thresh=new_track_thresh,
            match_thresh=match_thresh,
            proximity_thresh=proximity_thresh,
            appearance_thresh=appearance_thresh,
            second_match_thresh=second_match_thresh,
            unconfirmed_match_thresh=unconfirmed_match_thresh,
            unconfirmed_emb_scale=unconfirmed_emb_scale,
            fuse_first_associate=fuse_first_associate,
            with_reid=with_reid,
            max_time_lost=self.buffer_size,
            feat_dim=feat_dim,
            nr_classes=self.nr_classes,
            is_obb=self.is_obb,
            std_weight_position=std_weight_position,
            std_weight_velocity=std_weight_velocity,
            capacity=capacity,
        )
        if use_cmc and cmc_method not in (None, "none"):
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

    @staticmethod
    def _obb_hull_np(xywha):
        """Enclosing AABBs of rotated boxes for CMC feature masking
        (_obb_detections_to_cmc_boxes, botsort.py:126-131)."""
        cx, cy, w, h, a = (xywha[:, i] for i in range(5))
        ca, sa = np.abs(np.cos(a)), np.abs(np.sin(a))
        hx = (w * ca + h * sa) / 2.0
        hy = (w * sa + h * ca) / 2.0
        return np.stack([cx - hx, cy - hy, cx + hx, cy + hy], axis=-1)

    def update(self, dets, img=None, embs=None, masks=None):
        self._pending = {"img": img, "embs": embs}
        return super().update(dets, img, embs, masks)

    def _lost_mask(self, state):
        # KF-predicted boxes of LOST slots feed show_kf_preds overlays
        return np.asarray(state.status) == LOST

    def _step(self, state, dets_padded, det_valid):
        D = dets_padded.shape[0]
        B = 5 if self.cfg.is_obb else 4
        embs = self._pending.get("embs")
        img = self._pending.get("img")
        F = self.cfg.feat_dim
        emb_pad = np.zeros((D, F), np.float32)
        n = int(np.asarray(det_valid).sum())
        if self.with_reid and n:
            if embs is not None:
                emb_pad[:n] = np.asarray(embs, np.float32)[:n]
            elif self.model is not None and img is not None:
                boxes = np.asarray(dets_padded)[:n, :B]
                emb_pad[:n] = self.model.get_features(boxes, img)
        if self.cmc is not None and img is not None:
            boxes = np.asarray(dets_padded)[:n, :B]
            if self.cfg.is_obb:
                boxes = self._obb_hull_np(boxes)
            warp = self.cmc.apply(img, boxes)
        else:
            warp = IDENTITY_WARP
        import jax.numpy as jnp

        return botsort_step(
            self.cfg,
            state,
            dets_padded,
            det_valid,
            jnp.asarray(emb_pad),
            jnp.asarray(warp, jnp.float32),
        )
