"""Pallas TPU kernels for association hot ops.

The per-frame tracker step is dominated by (K, D) pairwise geometry on
the VPU.  XLA fuses the jnp formulation well; these kernels go one step
further by emitting the whole pairwise IoU + fused-score cost as a
single VMEM-resident program — one read of the (K, 4)/(D, 4) box
tables, one write each of the IoU and cost matrices, no intermediate
HBM tiles.  K and D are tracker capacities (<= 256), so everything sits
comfortably in VMEM (a 256 x 256 f32 tile is 256 KB).

`fused_iou_cost` returns (iou, cost = 1 - iou * conf) — exactly the two
matrices ByteTrack's three association passes share
(trackers/bytetrack.py).  On non-TPU backends it falls back to the
plain jnp formulation (identical math); interpret mode covers CPU
testing.

Measured reality check (v5e, 256 x 256): the standalone Pallas call is
bit-identical to the XLA-fused jnp version but slower per dispatch
(~3.2 ms vs ~0.45 ms through the tunnel) — at tracker capacities this
op is dispatch-bound and XLA's automatic fusion is already optimal, so
the tracker steps keep the jnp formulation.  The kernel stays as the
validated template for VMEM-resident association ops at capacities
where a (K, D) intermediate would spill (K, D >> 1024).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _iou_cost_kernel(trk_ref, det_t_ref, conf_ref, iou_ref, cost_ref):
    # trk_ref: (K, 4) xyxy; det_t_ref: (4, D) transposed xyxy;
    # conf_ref: (1, D); outputs (K, D).
    tx1 = trk_ref[:, 0:1]
    ty1 = trk_ref[:, 1:2]
    tx2 = trk_ref[:, 2:3]
    ty2 = trk_ref[:, 3:4]
    dx1 = det_t_ref[0:1, :]
    dy1 = det_t_ref[1:2, :]
    dx2 = det_t_ref[2:3, :]
    dy2 = det_t_ref[3:4, :]

    xx1 = jnp.maximum(tx1, dx1)
    yy1 = jnp.maximum(ty1, dy1)
    xx2 = jnp.minimum(tx2, dx2)
    yy2 = jnp.minimum(ty2, dy2)
    inter = jnp.maximum(xx2 - xx1, 0.0) * jnp.maximum(yy2 - yy1, 0.0)
    area_t = (tx2 - tx1) * (ty2 - ty1)
    area_d = (dx2 - dx1) * (dy2 - dy1)
    iou = inter / jnp.maximum(area_t + area_d - inter, 1e-9)
    iou_ref[:, :] = iou
    cost_ref[:, :] = 1.0 - iou * conf_ref[0:1, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_iou_cost_pallas(trk, det_t, conf, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = trk.shape[0]
    D = det_t.shape[1]
    return pl.pallas_call(
        _iou_cost_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, D), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(trk, det_t, conf)


def _fused_iou_cost_jnp(trk, det, conf):
    xx1 = jnp.maximum(trk[:, None, 0], det[None, :, 0])
    yy1 = jnp.maximum(trk[:, None, 1], det[None, :, 1])
    xx2 = jnp.minimum(trk[:, None, 2], det[None, :, 2])
    yy2 = jnp.minimum(trk[:, None, 3], det[None, :, 3])
    inter = jnp.maximum(xx2 - xx1, 0.0) * jnp.maximum(yy2 - yy1, 0.0)
    area_t = (trk[:, 2] - trk[:, 0]) * (trk[:, 3] - trk[:, 1])
    area_d = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
    iou = inter / jnp.maximum(area_t[:, None] + area_d[None, :] - inter, 1e-9)
    return iou, 1.0 - iou * conf[None, :]


def fused_iou_cost(trk_xyxy, det_xyxy, conf, interpret: bool | None = None):
    """(iou (K, D), cost (K, D) = 1 - iou * conf) in one pass.

    Uses the Pallas kernel on TPU (or when interpret=True for testing);
    identical jnp math elsewhere.
    """
    trk_xyxy = jnp.asarray(trk_xyxy, jnp.float32)
    det_xyxy = jnp.asarray(det_xyxy, jnp.float32)
    conf = jnp.asarray(conf, jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None and not on_tpu:
        return _fused_iou_cost_jnp(trk_xyxy, det_xyxy, conf)
    return _fused_iou_cost_pallas(
        trk_xyxy,
        det_xyxy.T,
        conf[None, :],
        interpret=bool(interpret) if interpret is not None else False,
    )
