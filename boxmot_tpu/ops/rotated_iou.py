"""Rotated-box IoU as a pure, vectorized JAX kernel.

The reference computes OBB IoU pairwise on the host with
cv.rotatedRectangleIntersection + cv.contourArea inside a Python loop
(boxmot/trackers/association/iou.py:5-116).  Here the convex intersection
is computed for ALL pairs at once with a fixed-shape Sutherland-Hodgman
clip (4 half-plane stages) and a shoelace area, so the whole (N,M) matrix
is one XLA program on the VPU.

Fixed-shape trick: instead of compacting the vertex list after each clip
stage, invalid slots are filled with the previous valid vertex.  Adjacent
duplicate vertices contribute zero to the shoelace sum and clip as
zero-length edges, so correctness is preserved with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boxmot_tpu.ops import geometry


def _forward_fill(verts, valid):
    """Replace invalid vertex slots with the previous valid vertex (cyclic).

    verts: (..., S, 2), valid: (..., S) bool.  Python loop over S (static,
    small) keeps this fully vectorized over the leading axes.
    """
    S = verts.shape[-2]
    filled = []
    carry = None
    carry_valid = None
    for i in range(S):
        v = verts[..., i, :]
        ok = valid[..., i]
        if carry is None:
            cur = v
            cur_ok = ok
        else:
            cur = jnp.where(ok[..., None], v, carry)
            cur_ok = ok | carry_valid
        filled.append(cur)
        carry, carry_valid = cur, cur_ok
    # `carry` is now the last valid vertex (or garbage if none valid).
    out = jnp.stack(filled, axis=-2)
    # Leading slots that had no previous valid vertex: use the cyclic
    # predecessor, i.e. the overall last valid vertex.
    lead_invalid = jnp.cumsum(valid.astype(jnp.int32), axis=-1) == 0
    out = jnp.where(lead_invalid[..., None], carry[..., None, :], out)
    return out


def _clip_halfplane(verts, nonempty, p1, p2, orient):
    """Clip a duplicate-padded closed polygon by the half-plane at edge p1->p2.

    verts: (..., S, 2) — every slot is a vertex of the closed polygon
    (invalid slots hold duplicates of their predecessor, which is
    geometry-neutral).  nonempty: (...,) bool — whether the polygon has any
    area left.  p1, p2: (..., 2); orient: (...,) +-1 selecting the inside
    of the clip polygon.  Returns (..., 2S, 2) vertices + nonempty.
    """
    d = p2 - p1  # (..., 2)
    # Signed distance (cross product) of each vertex to the edge line.
    rel = verts - p1[..., None, :]
    cross = d[..., None, 0] * rel[..., 1] - d[..., None, 1] * rel[..., 0]
    side = cross * orient[..., None]  # >= 0 means inside
    inside = side >= 0.0

    nxt = jnp.roll(verts, shift=-1, axis=-2)
    nxt_inside = jnp.roll(inside, shift=-1, axis=-1)
    nxt_side = jnp.roll(side, shift=-1, axis=-1)

    # Crossing point of each edge with the clip line.
    denom = side - nxt_side
    t = side / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    crossing = verts + t[..., None] * (nxt - verts)
    cross_valid = inside != nxt_inside

    # Sutherland-Hodgman emission per input edge cur->next:
    #   slot 2i   = crossing  (if the edge crosses the clip line)
    #   slot 2i+1 = next      (if next is inside)
    S = verts.shape[-2]
    interleave = jnp.stack([crossing, nxt], axis=-2)  # (..., S, 2, 2)
    out_verts = interleave.reshape(*verts.shape[:-2], 2 * S, 2)
    out_valid = jnp.stack([cross_valid, nxt_inside], axis=-1).reshape(
        *inside.shape[:-1], 2 * S
    )
    out_valid = out_valid & nonempty[..., None]
    out_verts = _forward_fill(out_verts, out_valid)
    return out_verts, nonempty & jnp.any(out_valid, axis=-1)


def _shoelace_area(verts, any_valid):
    nxt = jnp.roll(verts, shift=-1, axis=-2)
    s = verts[..., 0] * nxt[..., 1] - nxt[..., 0] * verts[..., 1]
    area = 0.5 * jnp.abs(jnp.sum(s, axis=-1))
    return jnp.where(any_valid, area, 0.0)


def rect_intersection_area(obbs1, obbs2):
    """Pairwise intersection area of rotated rects.

    obbs1: (N, 5) (cx,cy,w,h,angle_rad); obbs2: (M, 5).  Returns (N, M).
    """
    c1 = geometry.obb_corners(obbs1)  # (N, 4, 2)
    c2 = geometry.obb_corners(obbs2)  # (M, 4, 2)
    N, M = obbs1.shape[0], obbs2.shape[0]

    # Center each pair at the origin before clipping: cross products of
    # image-scale coordinates (~1e3) lose fp32 precision on the MXU/VPU,
    # which can flip inside/outside tests for slim intersections.
    offset = (obbs1[:, None, None, :2] + obbs2[None, :, None, :2]) / 2.0  # (N,M,1,2)

    # Subject polygon: rect1 corners broadcast over pairs.
    verts = jnp.broadcast_to(c1[:, None, :, :], (N, M, 4, 2)) - offset
    nonempty = jnp.ones((N, M), dtype=bool)

    # Clip-polygon orientation: signed area of rect2 corner loop.
    nxt2 = jnp.roll(c2, shift=-1, axis=-2)
    signed2 = 0.5 * jnp.sum(
        c2[..., 0] * nxt2[..., 1] - nxt2[..., 0] * c2[..., 1], axis=-1
    )
    orient = jnp.where(signed2 >= 0, 1.0, -1.0)  # (M,)
    orient_pair = jnp.broadcast_to(orient[None, :], (N, M))

    c2_pair = jnp.broadcast_to(c2[None, :, :, :], (N, M, 4, 2)) - offset
    nxt2_pair = jnp.broadcast_to(nxt2[None, :, :, :], (N, M, 4, 2)) - offset
    for k in range(4):
        verts, nonempty = _clip_halfplane(
            verts, nonempty, c2_pair[:, :, k, :], nxt2_pair[:, :, k, :], orient_pair
        )

    return _shoelace_area(verts, nonempty)


# Above this many pairs the doubling clip's (N, M, S, 2) HBM temps both
# dominate the runtime and eventually stop fitting (4096 x 4096 needs
# ~20 GB of temps on a 16 GB v5e); the tiled Pallas kernel
# (ops/pallas_rotated_iou.py) keeps every clip stage in VMEM.  Measured
# crossover on a v5e: jnp wins at 1024^2 (52 vs 91 ms/call), Pallas wins
# from 2048^2 (70 vs 149 ms) and is the only path that runs at >= 4096^2.
_PALLAS_MIN_PAIRS = 1 << 21


def iou_batch_obb(obbs1, obbs2):
    """Pairwise rotated IoU.  Mirrors _iou_obb_matrix semantics
    (iou.py:38-116) without the host loop: inter / (a1 + a2 - inter).

    Large (unbatched) problems route to the VMEM-tiled Pallas kernel on
    TPU; tracker-capacity problems and vmapped calls keep the XLA-fused
    formulation below.
    """
    obbs1 = jnp.asarray(obbs1)[..., :5]
    obbs2 = jnp.asarray(obbs2)[..., :5]
    if (
        obbs1.ndim == 2
        and obbs2.ndim == 2
        and obbs1.shape[0] * obbs2.shape[0] >= _PALLAS_MIN_PAIRS
        and jax.default_backend() == "tpu"
    ):
        from boxmot_tpu.ops.pallas_rotated_iou import rotated_iou_pallas

        return rotated_iou_pallas(obbs1, obbs2)
    inter = rect_intersection_area(obbs1, obbs2)
    a1 = obbs1[:, 2] * obbs1[:, 3]
    a2 = obbs2[:, 2] * obbs2[:, 3]
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
