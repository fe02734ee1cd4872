"""BoostTrack as a fixed-capacity struct-of-arrays XLA program.

Re-design of the reference BoostTrack
(boxmot/trackers/bbox/boosttrack/boosttrack.py:20-529 and assoc.py):
single-pass association on the XYHR filter with a multi-cue cost and
detection-confidence boosting.

Semantics preserved:
  * track confidence: 0.9^(7-age) while warming up, else 0.9^(tsu-1)
    (boosttrack.py:113-117)
  * DLO boost: conf = max(conf, max_s * dlo_boost_coef) where S is IoU
    (or the rich / soft-BIoU / varying-threshold variants of
    BoostTrack++: use_rich_s, use_sb, use_vt)      (boosttrack.py:500-529)
  * DUO boost: unexplained detections (Mahalanobis distance above the
    99% chi2 limit to every track) below det_thresh get lifted to it,
    with IoU-overlap suppression keeping the most confident candidate
    (boosttrack.py:452-489)
  * association cost = iou + l_iou*conf*iou + l_mhd*MhSim +
    l_shape*conf*shape_sim + l_emb*emb, where conf = det_conf x trk_conf
    gated at iou_threshold, MhSim is the column-softmaxed inverted
    Mahalanobis similarity, and l_emb = (1+l_iou+l_shape+l_mhd)*1.5
    (assoc.py:156-203)
  * match validity: iou >= thr OR (emb >= 0.75 AND iou >= thr/2)
  * camera update rebuilds the state from warped corners before predict
  * output: KF state boxes gated by min_hits warm-up, then filtered by
    aspect ratio and minimum area (boosttrack.py:415-423)
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
from boxmot_tpu.trackers.botsort import IDENTITY_WARP
from boxmot_tpu.trackers.ocsort import _full_assignment, _unique_shortcut

MH_LIMIT = 13.2767  # 99% chi2(4) limit (assoc.py:38)


@dataclasses.dataclass(frozen=True)
class BoostTrackConfig:
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
    with_reid: bool = False
    feat_dim: int = 512
    capacity: int = 256


@struct.dataclass
class BoostTrackState:
    mean: jax.Array  # (K, 8) xyhr + velocities
    cov: jax.Array
    active: jax.Array
    age: jax.Array
    tsu: jax.Array
    hit_streak: jax.Array
    tid: jax.Array
    conf: jax.Array
    cls: jax.Array
    det_ind: jax.Array
    emb: jax.Array  # (K, F)
    frame_count: jax.Array
    next_id: jax.Array


def init_state(cfg: BoostTrackConfig) -> BoostTrackState:
    K, F = cfg.capacity, cfg.feat_dim
    return BoostTrackState(
        mean=jnp.zeros((K, 8), jnp.float32),
        cov=jnp.zeros((K, 8, 8), jnp.float32),
        active=jnp.zeros((K,), bool),
        age=jnp.zeros((K,), jnp.int32),
        tsu=jnp.zeros((K,), jnp.int32),
        hit_streak=jnp.zeros((K,), jnp.int32),
        tid=jnp.zeros((K,), jnp.int32),
        conf=jnp.zeros((K,), jnp.float32),
        cls=jnp.zeros((K,), jnp.float32),
        det_ind=jnp.zeros((K,), jnp.float32),
        emb=jnp.zeros((K, F), jnp.float32),
        frame_count=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
    )


def xyhr2xyxy(mean):
    x, y, h, r = mean[..., 0], mean[..., 1], mean[..., 2], mean[..., 3]
    w = jnp.where(r <= 0, 0.0, r * h)
    return jnp.stack([x - w / 2, y - h / 2, x + w / 2, y + h / 2], axis=-1)


def xyxy2xyhr(box):
    w = box[..., 2] - box[..., 0]
    h = box[..., 3] - box[..., 1]
    return jnp.stack(
        [
            box[..., 0] + w / 2,
            box[..., 1] + h / 2,
            h,
            w / (h + 1e-6),
        ],
        axis=-1,
    )


def obb2xyhr(box):
    """(cx,cy,w,h,theta) -> KF measurement (cx,cy,h,r=w/h,theta)
    (convert_xywha_to_z, boosttrack.py:46-56)."""
    w = jnp.maximum(box[..., 2], 1e-4)
    h = jnp.maximum(box[..., 3], 1e-4)
    return jnp.stack(
        [box[..., 0], box[..., 1], h, w / h, box[..., 4]], axis=-1
    )


def xyhr2obb(mean):
    """KF state (cx,cy,h,r,theta,...) -> (cx,cy,w,h,theta)
    (convert_x_to_xywha, boosttrack.py:58-63)."""
    h, r = mean[..., 2], mean[..., 3]
    return jnp.stack(
        [mean[..., 0], mean[..., 1], h * r, h, mean[..., 4]], axis=-1
    )


def _iou(a, b):
    xx1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    yy1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    xx2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    yy2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    wh = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return wh / jnp.maximum(aa[:, None] + ab[None, :] - wh, 1e-12)


def soft_biou(det_box, det_conf_ignored, trk_box, trk_conf):
    """Soft-BIoU (assoc.py:73-110): boxes buffered by (1-conf) factors,
    with the second argument's conf (here the track's) driving both."""
    k1, k2 = 0.25, 0.5
    b1 = det_box[:, None, :]
    b2 = trk_box[None, :, :]
    c2 = trk_conf[None, :]
    e1w = (b1[..., 2] - b1[..., 0]) * (1 - c2) * k1
    e1h = (b1[..., 3] - b1[..., 1]) * (1 - c2) * k1
    e2w = (b2[..., 2] - b2[..., 0]) * (1 - c2) * k2
    e2h = (b2[..., 3] - b2[..., 1]) * (1 - c2) * k2
    b1x1, b1y1, b1x2, b1y2 = b1[..., 0] - e1w, b1[..., 1] - e1h, b1[..., 2] + e1w, b1[..., 3] + e1h
    b2x1, b2y1, b2x2, b2y2 = b2[..., 0] - e2w, b2[..., 1] - e2h, b2[..., 2] + e2w, b2[..., 3] + e2h
    xx1 = jnp.maximum(b1x1, b2x1)
    yy1 = jnp.maximum(b1y1, b2y1)
    xx2 = jnp.minimum(b1x2, b2x2)
    yy2 = jnp.minimum(b1y2, b2y2)
    wh = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
    return wh / jnp.maximum(
        (b1x2 - b1x1) * (b1y2 - b1y1) + (b2x2 - b2x1) * (b2y2 - b2y1) - wh, 1e-12
    )


def shape_similarity(det_box, trk_box, s_sim_corr: bool):
    dw = (det_box[:, 2] - det_box[:, 0])[:, None]
    dh = (det_box[:, 3] - det_box[:, 1])[:, None]
    tw = (trk_box[:, 2] - trk_box[:, 0])[None, :]
    th = (trk_box[:, 3] - trk_box[:, 1])[None, :]
    if s_sim_corr:
        return jnp.exp(
            -(jnp.abs(dw - tw) / jnp.maximum(dw, tw) + jnp.abs(dh - th) / jnp.maximum(dh, th))
        )
    # v1 quirk: both terms normalized by max(dw, tw) (assoc.py:15-23)
    return jnp.exp(
        -(jnp.abs(dw - tw) / jnp.maximum(dw, tw) + jnp.abs(dh - th) / jnp.maximum(dw, tw))
    )


def mh_similarity(md, valid):
    """MhDist_similarity (assoc.py:37-48): clamp, invert, per-column
    softmax over detections, masked entries excluded and zeroed."""
    mask = md > MH_LIMIT
    s = MH_LIMIT - jnp.minimum(md, MH_LIMIT)
    e = jnp.where(valid, jnp.exp(s), 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=0, keepdims=True), 1e-12)
    sim = e / denom
    return jnp.where(mask | ~valid, 0.0, sim)


def camera_update_xyhr(mean, warp, active):
    """Warp the state box corners and rebuild [x, y, h, r]
    (boosttrack.py:318-321 camera_update)."""
    m = warp[:2, :2]
    t = warp[:2, 2]
    sb = xyhr2xyxy(mean[:, :4])
    p1 = sb[:, :2] @ m.T + t
    p2 = sb[:, 2:] @ m.T + t
    new_xyhr = xyxy2xyhr(jnp.concatenate([p1, p2], axis=-1))
    return mean.at[:, :4].set(jnp.where(active[:, None], new_xyhr, mean[:, :4]))


def track_confidence(age, tsu, active):
    """get_confidence (boosttrack.py:113-117)."""
    conf = jnp.where(
        age < 7,
        0.9 ** (7 - age).astype(jnp.float32),
        0.9 ** (tsu - 1).astype(jnp.float32),
    )
    return jnp.where(active, conf, 0.0)


def mh_distance(det_box, mean, cov, pair_valid):
    """Diagonal-normalized Mahalanobis distance (boosttrack.py:437-450)."""
    det_z = xyxy2xyhr(det_box)
    diag = jnp.stack([cov[:, i, i] for i in range(4)], axis=-1)
    sigma_inv = 1.0 / jnp.maximum(diag, 1e-12)
    diff = det_z[:, None, :] - mean[None, :, :4]
    return jnp.sum(diff**2 * sigma_inv[None, :, :], axis=-1)  # (D, K)


def dlo_boost(cfg, conf, det_valid, det_box, trk_box, trk_conf, tsu, md, pair_valid):
    """DLO confidence boost (boosttrack.py:491-529)."""
    if cfg.use_rich_s:
        mhd_sim = mh_similarity(md, pair_valid)
        ssim = shape_similarity(det_box, trk_box, cfg.s_sim_corr)
        sb_iou = soft_biou(det_box, conf, trk_box, trk_conf)
        S = (mhd_sim + ssim + sb_iou) / 3.0
    else:
        S = _iou(det_box, trk_box)
    S = jnp.where(pair_valid, S, 0.0)
    max_s = jnp.max(S, axis=1)
    if not cfg.use_sb and not cfg.use_vt:
        return jnp.where(det_valid, jnp.maximum(conf, max_s * cfg.dlo_boost_coef), conf)
    if cfg.use_sb:
        alpha = 0.65
        conf = jnp.where(
            det_valid,
            jnp.maximum(conf, alpha * conf + (1 - alpha) * max_s**1.5),
            conf,
        )
    if cfg.use_vt:
        thr = jnp.maximum(0.95 - (tsu - 1).astype(jnp.float32), 0.8)
        hit = jnp.any(jnp.where(pair_valid, S > thr[None, :], False), axis=1)
        conf = jnp.where(det_valid & hit, jnp.maximum(conf, cfg.det_thresh + 1e-5), conf)
    return conf


def duo_boost(cfg, conf, det_valid, md, pair_valid, active):
    """DUO confidence boost (boosttrack.py:452-489)."""
    D = conf.shape[0]
    det_box_is_unused = None  # boxes enter via the iou of candidates below
    md_min = jnp.min(jnp.where(pair_valid, md, jnp.inf), axis=1)
    any_track = jnp.any(active)
    cand = det_valid & (md_min > MH_LIMIT) & (conf < cfg.det_thresh) & any_track
    return cand


def _duo_apply(cfg, conf, det_valid, det_box, cand):
    D = conf.shape[0]
    diou = _iou(det_box, det_box)
    diou = jnp.where(cand[:, None] & cand[None, :], diou, 0.0)
    diou = diou - jnp.eye(D) * diou
    diou_max = jnp.max(diou, axis=1)
    isolated = cand & (diou_max <= 0.3)
    has_overlap = cand & (diou_max > 0.3)
    peer = (diou > 0.3) & has_overlap[None, :]
    peer = peer | jnp.eye(D, dtype=bool)
    peer_conf = jnp.where(peer & cand[None, :], conf[None, :], -jnp.inf)
    local_max = jnp.max(peer_conf, axis=1)
    winner = has_overlap & (conf >= local_max)
    boost = isolated | winner
    return jnp.where(boost, cfg.det_thresh + 1e-4, conf)


def boost_cost(cfg, det_box, trk_box, conf, trk_conf, md, iou_dk, valid_dk,
               emb_cost, lambda_emb_multiplier=1.5):
    """Multi-cue association cost (assoc.py:156-203), (D, K)."""
    cost = iou_dk
    conf_dk = conf[:, None] * trk_conf[None, :]
    conf_dk = jnp.where(iou_dk < cfg.iou_threshold, 0.0, conf_dk)
    cost = cost + cfg.lambda_iou * conf_dk * iou_dk
    mh_sim = mh_similarity(md, valid_dk)
    cost = cost + cfg.lambda_mhd * mh_sim
    cost = cost + cfg.lambda_shape * conf_dk * shape_similarity(
        det_box, trk_box, cfg.s_sim_corr
    )
    if cfg.with_reid:
        lambda_emb = (1 + cfg.lambda_iou + cfg.lambda_shape + cfg.lambda_mhd) * lambda_emb_multiplier
        cost = cost + lambda_emb * emb_cost
    return cost


@partial(tracker_jit, static_argnames=("cfg",))
def boosttrack_step(cfg: BoostTrackConfig, state: BoostTrackState, dets, det_valid, embs, warp):
    layout = kalman.make_xyhr_layout()
    K, D = cfg.capacity, dets.shape[0]
    frame = state.frame_count + 1
    active = state.active

    det_box = dets[:, :4]
    conf = jnp.where(det_valid, dets[:, 4], -1.0)

    # --- camera update before predict, then predict + track confidence
    mean = camera_update_xyhr(state.mean, warp, active)
    mean, cov = kalman.predict(layout, mean, state.cov, active)
    age = state.age + active.astype(jnp.int32)
    hit_streak = jnp.where(active & (state.tsu > 0), 0, state.hit_streak)
    tsu = state.tsu + active.astype(jnp.int32)
    trk_conf = track_confidence(age, tsu, active)
    trk_box = xyhr2xyxy(mean[:, :4])

    det_z = xyxy2xyhr(det_box)
    md = mh_distance(det_box, mean, cov, None)
    pair_valid = det_valid[:, None] & active[None, :]

    if cfg.use_dlo_boost:
        conf = dlo_boost(cfg, conf, det_valid, det_box, trk_box, trk_conf, tsu, md, pair_valid)
    if cfg.use_duo_boost:
        cand = duo_boost(cfg, conf, det_valid, md, pair_valid, active)
        conf = _duo_apply(cfg, conf, det_valid, det_box, cand)

    # --- threshold filter (boosttrack.py:340-343: conf >= det_thresh)
    first = det_valid & (conf >= cfg.det_thresh)

    det_emb = embs / jnp.maximum(jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-12)

    # --- association (assoc.py:156-203); matrices are (D, K) det x track
    iou_dk = _iou(det_box, trk_box)
    iou_dk = jnp.where(first[:, None] & active[None, :], iou_dk, 0.0)
    if cfg.with_reid:
        emb_cost = det_emb @ state.emb.T  # (D, K)
    else:
        emb_cost = jnp.zeros((D, K), jnp.float32)
    cost = boost_cost(
        cfg, det_box, trk_box, conf, trk_conf, md, iou_dk,
        first[:, None] & active[None, :], emb_cost,
    )

    # match() (assoc.py:113-120): unique-candidate shortcut on the
    # combined cost, else full lapjv on -cost; orientation here is (K, D)
    cost_kd = cost.T
    usable, r2c_short = _unique_shortcut(cost_kd, active, first, cfg.iou_threshold)
    r2c_full = _full_assignment(-cost_kd, active, first)
    r2c = jnp.where(usable, r2c_short, r2c_full)
    c = jnp.clip(r2c, 0, D - 1)
    iou_of = iou_dk.T[jnp.arange(K), c]
    emb_of = emb_cost.T[jnp.arange(K), c]
    valid_match = (iou_of >= cfg.iou_threshold) | (
        cfg.with_reid & (emb_of >= 0.75) & (iou_of >= cfg.iou_threshold / 2)
    )
    matched = (r2c >= 0) & valid_match
    dm = jnp.zeros((D,), bool).at[jnp.where(matched, r2c, D)].set(True, mode="drop")

    # --- KF update
    meas = det_z[c]
    mean, cov = kalman.update(
        layout, mean, cov, meas, jnp.zeros((K,), jnp.float32), matched
    )
    trust = (conf[c] - cfg.det_thresh) / (1 - cfg.det_thresh)
    det_alpha = 0.95 + 0.05 * (1 - trust)
    a = det_alpha[:, None]
    new_emb = a * state.emb + (1 - a) * det_emb[c]
    new_emb = new_emb / jnp.maximum(
        jnp.linalg.norm(new_emb, axis=-1, keepdims=True), 1e-12
    )
    emb = jnp.where((matched & cfg.with_reid)[:, None], new_emb, state.emb)

    hit_streak = hit_streak + matched.astype(jnp.int32)
    tsu = jnp.where(matched, 0, tsu)
    conf_s = jnp.where(matched, conf[c], state.conf)
    cls_s = jnp.where(matched, dets[:, 5][c], state.cls)
    det_ind_s = jnp.where(matched, dets[:, 6][c], state.det_ind)

    # --- new tracks.  ID order mirrors the reference's unmatched list:
    # never-matched detections ascending FIRST, then detections whose
    # assignment failed the validity gate (boosttrack.py:390-395 creates
    # trackers in the order assoc.py:132-151 built unmatched_detections).
    new_det = first & ~dm
    n_new = jnp.sum(new_det.astype(jnp.int32))
    inv_det = (
        jnp.zeros((D,), bool)
        .at[jnp.where((r2c >= 0) & ~valid_match, r2c, D)]
        .set(True, mode="drop")
    )
    order_key = jnp.arange(D, dtype=jnp.int32) + D * inv_det.astype(jnp.int32)
    det_rank = jnp.sum(
        (order_key[None, :] < order_key[:, None]) & new_det[None, :], axis=1
    )
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
    cls_s = jnp.where(takes, dets[:, 5][slot_det], cls_s)
    det_ind_s = jnp.where(takes, dets[:, 6][slot_det], det_ind_s)
    age = jnp.where(takes, 0, age)
    tsu = jnp.where(takes, 0, tsu)
    hit_streak = jnp.where(takes, 0, hit_streak)
    emb = jnp.where(takes[:, None], det_emb[slot_det], emb)

    # --- output then removal (boosttrack.py:399-413)
    out_box = xyhr2xyxy(mean[:, :4])
    w_arr = out_box[:, 2] - out_box[:, 0]
    h_arr = out_box[:, 3] - out_box[:, 1]
    shape_ok = (w_arr / jnp.maximum(h_arr, 1e-12) <= cfg.aspect_ratio_thresh) & (
        w_arr * h_arr > cfg.min_box_area
    )
    out_mask = (
        active
        & (tsu < 1)
        & ((hit_streak >= cfg.min_hits) | (frame <= cfg.min_hits))
        & shape_ok
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
    active = active & ~(tsu > cfg.max_age)

    new_state = BoostTrackState(
        mean=mean,
        cov=cov,
        active=active,
        age=age,
        tsu=tsu,
        hit_streak=hit_streak,
        tid=tid,
        conf=conf_s,
        cls=cls_s,
        det_ind=det_ind_s,
        emb=emb,
        frame_count=frame,
        next_id=state.next_id + n_new,
    )
    return new_state, out, out_mask


class BoostTrack(BaseTracker):
    """Host wrapper mirroring the reference constructor (boosttrack.py:240-298)."""

    supports_obb = False

    def __init__(
        self,
        reid_model=None,
        use_cmc: bool = True,
        min_box_area: int = 10,
        aspect_ratio_thresh: float = 1.6,
        cmc_method: str = "ecc",
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
        with_reid: bool = False,
        adaptive_kf: bool = False,
        capacity: int = 256,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.with_reid = with_reid and reid_model is not None
        self.model = reid_model if self.with_reid else None
        feat_dim = getattr(reid_model, "feature_dim", 512) if self.model else 1
        self.cfg = BoostTrackConfig(
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

    def update(self, dets, img=None, embs=None, masks=None):
        self._pending = {"img": img, "embs": embs}
        return super().update(dets, img, embs, masks)

    def _step(self, state, dets_padded, det_valid):
        import jax.numpy as jnp

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
        if self.cmc is not None and img is not None:
            warp = self.cmc.apply(img, np.asarray(dets_padded)[:n, :4])
        else:
            warp = IDENTITY_WARP
        return boosttrack_step(
            self.cfg,
            state,
            dets_padded,
            det_valid,
            jnp.asarray(emb_pad),
            jnp.asarray(warp, jnp.float32),
        )
