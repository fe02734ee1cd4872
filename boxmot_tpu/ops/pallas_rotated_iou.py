"""Tiled Pallas TPU kernel for pairwise rotated-rect IoU.

Why this exists (and why the jnp formulation can't scale): the
Sutherland-Hodgman clip in `ops/rotated_iou.py` doubles the padded
vertex list at every stage (4 -> 8 -> 16 -> 32 -> 64 slots), so XLA
materialises (N, M, S, 2) HBM temporaries per stage.  At N = M = 4096
that is ~20 GB of HLO temps — it does not fit in a v5e's 16 GB HBM at
all (measured: `Ran out of memory in memory space hbm. Used 20.79G of
15.75G`).  Inside the vmapped batch replay the same temps pick up the
sequence axis (S_seq, K, D, 64, 2), squeezing HBM that the detector /
ReID programs want.

This kernel runs the identical clip algorithm per (TN, TM) output
tile with every vertex slot held as a VMEM-resident (TN, TM) tile —
zero HBM intermediates, O(N*M) output only.  The math is the same
fixed-shape duplicate-padding scheme as the jnp path (see
rotated_iou.py's module docstring), including the pair-centering trick
that keeps fp32 cross products accurate at image-scale coordinates.

Reference behavior being reproduced: pairwise cv2-style rotated
rectangle intersection over union (reference
boxmot/trackers/association/iou.py:38-116, host loop) — here as one
tiled TPU program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from boxmot_tpu.ops import geometry

# Tile sizes: lanes want 128 in the minor dim; 64 sublanes keeps the
# ~190 live (TN, TM) f32 vertex tiles of the final clip stage around
# 6 MB of VMEM.
_TN = 64
_TM = 128


def _clip_stage(X, Y, nonempty, p1x, p1y, p2x, p2y, orient):
    """One half-plane clip over slot lists of (TN, TM) tiles.

    X, Y: length-S lists of (TN, TM) vertex tiles (duplicate-padded
    closed polygon).  Returns length-2S lists + updated nonempty.
    Mirrors rotated_iou._clip_halfplane slot-for-slot.
    """
    S = len(X)
    dx = p2x - p1x
    dy = p2y - p1y
    side = [(dx * (Y[s] - p1y) - dy * (X[s] - p1x)) * orient for s in range(S)]
    inside = [side[s] >= 0.0 for s in range(S)]

    out_x, out_y, out_v = [], [], []
    for s in range(S):
        sn = (s + 1) % S
        denom = side[s] - side[sn]
        safe = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        t = side[s] / safe
        # slot 2s: the edge's crossing point with the clip line
        out_x.append(X[s] + t * (X[sn] - X[s]))
        out_y.append(Y[s] + t * (Y[sn] - Y[s]))
        out_v.append((inside[s] != inside[sn]) & nonempty)
        # slot 2s+1: the next vertex, if inside
        out_x.append(X[sn])
        out_y.append(Y[sn])
        out_v.append(inside[sn] & nonempty)

    # Forward-fill invalid slots with their predecessor (cyclic): the
    # running `ok` flag is the prefix-OR of validity, so slots before
    # the first valid vertex are exactly the ~ok ones and get the
    # overall last valid vertex afterwards.
    fx, fy, fok = [], [], []
    cx, cy, cok = out_x[0], out_y[0], out_v[0]
    fx.append(cx)
    fy.append(cy)
    fok.append(cok)
    for i in range(1, 2 * S):
        cx = jnp.where(out_v[i], out_x[i], cx)
        cy = jnp.where(out_v[i], out_y[i], cy)
        cok = out_v[i] | cok
        fx.append(cx)
        fy.append(cy)
        fok.append(cok)
    lastx, lasty, anyv = cx, cy, cok
    newX = [jnp.where(fok[i], fx[i], lastx) for i in range(2 * S)]
    newY = [jnp.where(fok[i], fy[i], lasty) for i in range(2 * S)]
    return newX, newY, nonempty & anyv


def _iou_obb_kernel(b1_ref, b2_ref, out_ref):
    # b1_ref: (TN, 9) = 4 corners (x, y interleaved) + area of rect1.
    # b2_ref: (10, TM) = 4 corners + area + winding orient of rect2.
    c1x = [b1_ref[:, 2 * k : 2 * k + 1] for k in range(4)]  # (TN, 1)
    c1y = [b1_ref[:, 2 * k + 1 : 2 * k + 2] for k in range(4)]
    a1 = b1_ref[:, 8:9]
    c2x = [b2_ref[2 * k : 2 * k + 1, :] for k in range(4)]  # (1, TM)
    c2y = [b2_ref[2 * k + 1 : 2 * k + 2, :] for k in range(4)]
    a2 = b2_ref[8:9, :]
    orient = b2_ref[9:10, :]

    # Pair-center offset (same fp32 conditioning trick as the jnp path):
    # rect centers are the diagonal corner midpoints.
    offx = ((c1x[0] + c1x[2]) * 0.5 + (c2x[0] + c2x[2]) * 0.5) * 0.5
    offy = ((c1y[0] + c1y[2]) * 0.5 + (c2y[0] + c2y[2]) * 0.5) * 0.5
    zero = jnp.zeros(out_ref.shape, jnp.float32)
    orient_b = orient + zero  # (TN, TM)

    # Subject polygon (rect1) and clip polygon (rect2), centered.
    X = [c1x[k] - offx for k in range(4)]  # each (TN, TM)
    Y = [c1y[k] - offy for k in range(4)]
    EX = [c2x[k] - offx for k in range(4)]
    EY = [c2y[k] - offy for k in range(4)]

    nonempty = zero >= 0.0  # all-true (TN, TM)
    for k in range(4):
        kn = (k + 1) % 4
        X, Y, nonempty = _clip_stage(
            X, Y, nonempty, EX[k], EY[k], EX[kn], EY[kn], orient_b
        )

    S = len(X)
    ssum = zero
    for s in range(S):
        sn = (s + 1) % S
        ssum = ssum + (X[s] * Y[sn] - X[sn] * Y[s])
    inter = jnp.where(nonempty, 0.5 * jnp.abs(ssum), 0.0)
    union = a1 + a2 - inter
    out_ref[:, :] = jnp.where(
        union > 0.0, inter / jnp.maximum(union, 1e-12), 0.0
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rotated_iou_pallas_padded(b1, b2t, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Np, Mp = b1.shape[0], b2t.shape[1]
    grid = (Np // _TN, Mp // _TM)
    return pl.pallas_call(
        _iou_obb_kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TN, 9), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((10, _TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TM), lambda i, j: (i, j)),
        interpret=interpret,
    )(b1, b2t)


def _pack_operands(obbs1, obbs2):
    """(N, 5)/(M, 5) xywha -> padded (Np, 9) and (10, Mp) kernel operands."""
    obbs1 = jnp.asarray(obbs1, jnp.float32)[..., :5]
    obbs2 = jnp.asarray(obbs2, jnp.float32)[..., :5]
    N, M = obbs1.shape[0], obbs2.shape[0]
    c1 = geometry.obb_corners(obbs1).reshape(N, 8)
    c2 = geometry.obb_corners(obbs2)  # (M, 4, 2)
    nxt2 = jnp.roll(c2, shift=-1, axis=-2)
    signed2 = 0.5 * jnp.sum(
        c2[..., 0] * nxt2[..., 1] - nxt2[..., 0] * c2[..., 1], axis=-1
    )
    orient = jnp.where(signed2 >= 0, 1.0, -1.0)
    a1 = obbs1[:, 2] * obbs1[:, 3]
    a2 = obbs2[:, 2] * obbs2[:, 3]
    b1 = jnp.concatenate([c1, a1[:, None]], axis=1)  # (N, 9)
    b2 = jnp.concatenate(
        [c2.reshape(M, 8), a2[:, None], orient[:, None]], axis=1
    )  # (M, 10)
    Np = -(-N // _TN) * _TN
    Mp = -(-M // _TM) * _TM
    b1 = jnp.pad(b1, ((0, Np - N), (0, 0)))
    b2 = jnp.pad(b2, ((0, Mp - M), (0, 0)))
    return b1, b2.T, N, M


def rotated_iou_pallas(obbs1, obbs2, *, interpret: bool = False):
    """Pairwise rotated IoU via the tiled VMEM-resident clip kernel.

    Same semantics as rotated_iou.iou_batch_obb; runs in O(N*M) HBM
    (the output) regardless of size.  interpret=True for CPU testing.
    """
    b1, b2t, N, M = _pack_operands(obbs1, obbs2)
    out = _rotated_iou_pallas_padded(b1, b2t, interpret=interpret)
    return out[:N, :M]
