"""Batched pairwise box-similarity kernels (IoU family) for association.

TPU-native re-design of the reference AssociationFunction
(boxmot/trackers/association/iou.py:118-407): every function is a pure
jit/vmap-friendly jnp computation over fixed-shape (N,4)/(M,4) inputs
producing an (N,M) similarity matrix.  Padding rows/cols are handled by
callers with validity masks; the formulas here are eps-guarded so padded
(zero) boxes never produce NaN/Inf.

All "similarity" outputs live in [0,1] (GIoU/CIoU/DIoU are rescaled from
[-1,1] exactly as in the reference) so cost = 1 - sim everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp

from boxmot_tpu.ops.rotated_iou import iou_batch_obb  # noqa: F401 (re-export)

_EPS = 1e-12


def _pairwise_corners(b1, b2):
    """Broadcast (N,4) x (M,4) to pairwise coordinate tensors."""
    b1 = b1[:, None, :]
    b2 = b2[None, :, :]
    return b1, b2


def _inter_area(b1, b2):
    xx1 = jnp.maximum(b1[..., 0], b2[..., 0])
    yy1 = jnp.maximum(b1[..., 1], b2[..., 1])
    xx2 = jnp.minimum(b1[..., 2], b2[..., 2])
    yy2 = jnp.minimum(b1[..., 3], b2[..., 3])
    w = jnp.maximum(0.0, xx2 - xx1)
    h = jnp.maximum(0.0, yy2 - yy1)
    return w * h


def _areas(b):
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def iou_batch(boxes1, boxes2):
    """Standard pairwise IoU (reference iou.py:134-152)."""
    b1, b2 = _pairwise_corners(boxes1, boxes2)
    wh = _inter_area(b1, b2)
    union = _areas(b1) + _areas(b2) - wh
    return wh / jnp.maximum(union, _EPS)


def hmiou_batch(boxes1, boxes2):
    """Height-modulated IoU: iou * vertical-overlap ratio (iou.py:157-206)."""
    b1, b2 = _pairwise_corners(boxes1, boxes2)
    inter_h = jnp.maximum(
        0.0, jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1])
    )
    union_h = jnp.maximum(
        1e-10, jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    )
    o = inter_h / union_h
    wh = _inter_area(b1, b2)
    union = _areas(b1) + _areas(b2) - wh
    iou = wh / (union + 1e-10)
    return iou * o


def giou_batch(boxes1, boxes2):
    """Generalized IoU rescaled to [0,1] (iou.py:207-247)."""
    b1, b2 = _pairwise_corners(boxes1, boxes2)
    wh = _inter_area(b1, b2)
    union = _areas(b1) + _areas(b2) - wh
    iou = wh / jnp.maximum(union, _EPS)
    wc = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    hc = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    area_enclose = jnp.maximum(wc * hc, _EPS)
    giou = iou - (area_enclose - union) / area_enclose
    return (giou + 1.0) / 2.0


def diou_batch(boxes1, boxes2):
    """Distance IoU rescaled to [0,1] (iou.py:344-386)."""
    b1, b2 = _pairwise_corners(boxes1, boxes2)
    wh = _inter_area(b1, b2)
    union = _areas(b1) + _areas(b2) - wh
    iou = wh / jnp.maximum(union, _EPS)
    cx1 = (b1[..., 0] + b1[..., 2]) / 2.0
    cy1 = (b1[..., 1] + b1[..., 3]) / 2.0
    cx2 = (b2[..., 0] + b2[..., 2]) / 2.0
    cy2 = (b2[..., 1] + b2[..., 3]) / 2.0
    inner_diag = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2
    ow = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    oh = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    outer_diag = jnp.maximum(ow**2 + oh**2, _EPS)
    diou = iou - inner_diag / outer_diag
    return (diou + 1.0) / 2.0


def ciou_batch(boxes1, boxes2):
    """Complete IoU rescaled to [0,1] (iou.py:277-343)."""
    eps = 1e-7
    b1, b2 = _pairwise_corners(boxes1, boxes2)
    wh = _inter_area(b1, b2)
    area1 = _areas(b1)
    area2 = _areas(b2)
    iou = wh / (area1 + area2 - wh + eps)
    cx1 = (b1[..., 0] + b1[..., 2]) / 2.0
    cy1 = (b1[..., 1] + b1[..., 3]) / 2.0
    cx2 = (b2[..., 0] + b2[..., 2]) / 2.0
    cy2 = (b2[..., 1] + b2[..., 3]) / 2.0
    inner_diag = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2
    ow = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    oh = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    outer_diag = ow**2 + oh**2 + eps
    w1 = b1[..., 2] - b1[..., 0]
    h1 = b1[..., 3] - b1[..., 1] + eps
    w2 = b2[..., 2] - b2[..., 0]
    h2 = b2[..., 3] - b2[..., 1] + eps
    arctan_diff = jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)
    v = (4.0 / (jnp.pi**2)) * (arctan_diff**2)
    alpha = v / (1.0 - iou + v + eps)
    ciou = iou - (inner_diag / outer_diag) + alpha * v
    return (ciou + 1.0) / 2.0


def centroid_batch(boxes1, boxes2, w, h):
    """1 - normalized centroid distance (iou.py:248-263)."""
    c1x = (boxes1[:, None, 0] + boxes1[:, None, 2]) / 2
    c1y = (boxes1[:, None, 1] + boxes1[:, None, 3]) / 2
    c2x = (boxes2[None, :, 0] + boxes2[None, :, 2]) / 2
    c2y = (boxes2[None, :, 1] + boxes2[None, :, 3]) / 2
    dist = jnp.sqrt((c1x - c2x) ** 2 + (c1y - c2y) ** 2)
    norm = jnp.sqrt(jnp.asarray(w, jnp.float32) ** 2 + jnp.asarray(h, jnp.float32) ** 2)
    return 1.0 - dist / norm


def centroid_batch_obb(obbs1, obbs2, w, h):
    """Centroid similarity for (cx,cy,w,h,angle) boxes (iou.py:264-276)."""
    dx = obbs1[:, None, 0] - obbs2[None, :, 0]
    dy = obbs1[:, None, 1] - obbs2[None, :, 1]
    dist = jnp.sqrt(dx**2 + dy**2)
    norm = jnp.sqrt(jnp.asarray(w, jnp.float32) ** 2 + jnp.asarray(h, jnp.float32) ** 2)
    return 1.0 - dist / norm


ASSO_FUNCS = {
    "iou": iou_batch,
    "iou_obb": iou_batch_obb,
    "hmiou": hmiou_batch,
    "giou": giou_batch,
    "ciou": ciou_batch,
    "diou": diou_batch,
}

# Functions that additionally need the frame (w, h) for normalization.
ASSO_FUNCS_WH = {
    "centroid": centroid_batch,
    "centroid_obb": centroid_batch_obb,
}


def get_asso_func(name: str, w: float | None = None, h: float | None = None):
    """Resolve an association-similarity function by name.

    Mirrors AssociationFunction._get_asso_func (iou.py:397-423); centroid
    variants are closed over the frame size.
    """
    if name in ASSO_FUNCS:
        return ASSO_FUNCS[name]
    if name in ASSO_FUNCS_WH:
        fn = ASSO_FUNCS_WH[name]
        if w is None or h is None:
            raise ValueError(f"asso func {name!r} requires frame w/h")
        return lambda b1, b2: fn(b1, b2, w, h)
    raise ValueError(
        f"Invalid association mode: {name}. Choose from "
        f"{sorted([*ASSO_FUNCS, *ASSO_FUNCS_WH])}"
    )
