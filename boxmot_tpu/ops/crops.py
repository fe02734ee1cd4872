"""Batched on-device crop extraction for ReID.

The reference crops on the host with cv2 per box
(boxmot/reid/backends/base_backend.py:19-196: integer crop + cv2.resize,
perspective/affine warp for OBBs, ImageNet standardization).  Here crop
+ resize + normalize is one XLA program over the frame, batched over all
detections, feeding the ReID backbone without host round-trips.

AABB crops exploit separability: clamped-bilinear resampling factors
into out = Wy @ img @ Wx^T, two batched matmuls that run on the MXU
(TPU gathers are catastrophically slow — ~1 ms/crop at 1080p).  Rotated
(OBB) crops are not separable (the sampling grid mixes axes), so they
keep the gather-based sampler.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _bilinear_sample(img, ys, xs):
    """Sample img (H, W, C) at fractional coords ys/xs (..., ) -> (..., C).

    Out-of-bounds coordinates clamp to the border (cv2 border replicate
    is close enough to the reference's integer clipping).
    """
    H, W = img.shape[0], img.shape[1]
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, H - 1.0)
    x1 = jnp.minimum(x0 + 1, W - 1.0)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _interp_matrix(coords, size):
    """Clamped-bilinear interpolation weights as a dense matrix.

    coords: (..., K) fractional source coordinates; returns (..., K, size)
    where row k holds weight 1-w at floor(c) and w at floor(c)+1 —
    exactly `_bilinear_sample`'s per-axis math, expressed as a matmul
    operand so the resize runs on the MXU instead of as giant gathers
    (measured: the gather formulation costs ~1 ms/crop on v5e and
    dominates the whole ReID pipeline for every backbone).
    """
    c = jnp.clip(coords, 0.0, size - 1.0)
    c0 = jnp.floor(c)
    c1 = jnp.minimum(c0 + 1, size - 1.0)
    w = c[..., None] - c0[..., None]
    grid = jnp.arange(size, dtype=jnp.float32)
    m0 = (c0[..., None] == grid) * (1.0 - w)
    m1 = (c1[..., None] == grid) * w
    return m0 + m1


def crop_resize_aabb(img, xyxy, out_hw=(256, 128)):
    """Crop+resize axis-aligned boxes.

    img: (H, W, C) float; xyxy: (N, 4); returns (N, out_h, out_w, C).
    Sampling matches a bilinear resize of the (clipped) crop region —
    numerically identical to the gather formulation, computed as two
    batched matmuls (separable bilinear): out = Wy @ img @ Wx^T.
    """
    oh, ow = out_hw
    H, W = img.shape[0], img.shape[1]
    x1, y1, x2, y2 = xyxy[:, 0], xyxy[:, 1], xyxy[:, 2], xyxy[:, 3]
    # cv2.resize maps output pixel centers to input via (i + 0.5) * scale - 0.5
    sy = (y2 - y1) / oh
    sx = (x2 - x1) / ow
    gy = (jnp.arange(oh, dtype=jnp.float32) + 0.5)[None, :] * sy[:, None] + (
        y1[:, None] - 0.5
    )
    gx = (jnp.arange(ow, dtype=jnp.float32) + 0.5)[None, :] * sx[:, None] + (
        x1[:, None] - 0.5
    )
    wy = _interp_matrix(gy, H)  # (N, oh, H)
    wx = _interp_matrix(gx, W)  # (N, ow, W)
    # contract W first (the larger axis): (N, H, ow, C), then H.
    # HIGHEST precision: default bf16 MXU passes round pixel values to
    # ~7e-3, which breaks "numerically identical"; fp32 passes keep the
    # max deviation at 2e-7 and still beat the gather formulation 10.7x
    # (measured on v5e, 64 crops @1080p: 5.6 ms vs 60 ms per frame).
    prec = jax.lax.Precision.HIGHEST
    t = jnp.einsum("hwc,njw->nhjc", img, wx, precision=prec)
    return jnp.einsum("nih,nhjc->nijc", wy, t, precision=prec)


def crop_resize_obb(img, xywha, out_hw=(256, 128)):
    """Rectified crops from rotated boxes (cx, cy, w, h, angle)."""
    oh, ow = out_hw
    cx, cy, w, h, a = (xywha[:, i] for i in range(5))
    ca, sa = jnp.cos(a), jnp.sin(a)
    # output pixel (i, j) maps to box-local (u, v) in [-w/2, w/2] x [-h/2, h/2]
    u = ((jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow - 0.5)[None, None, :] * w[
        :, None, None
    ]
    v = ((jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh - 0.5)[None, :, None] * h[
        :, None, None
    ]
    # -0.5: integer-coordinate pixel centers (same convention as the
    # AABB path / cv2.resize).
    xs = cx[:, None, None] + u * ca[:, None, None] - v * sa[:, None, None] - 0.5
    ys = cy[:, None, None] + u * sa[:, None, None] + v * ca[:, None, None] - 0.5
    return _bilinear_sample(img, ys, xs)


def standardize(crops_rgb01):
    """ImageNet standardization of (N, H, W, 3) RGB crops in [0, 1]."""
    mean = jnp.asarray(IMAGENET_MEAN, crops_rgb01.dtype)
    std = jnp.asarray(IMAGENET_STD, crops_rgb01.dtype)
    return (crops_rgb01 - mean) / std


def extract_crops(img_rgb, boxes, out_hw=(256, 128), is_obb=False):
    """Full device pipeline: crop + resize + [0,1] scale + standardize.

    img_rgb: (H, W, 3) uint8/float RGB frame.
    boxes: (N, 4) xyxy or (N, >=5) xywha when is_obb.
    """
    img = img_rgb.astype(jnp.float32) / 255.0
    crops = (
        crop_resize_obb(img, boxes[:, :5], out_hw)
        if is_obb
        else crop_resize_aabb(img, boxes[:, :4], out_hw)
    )
    return standardize(crops)
