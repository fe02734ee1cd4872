"""Fixed-shape non-maximum suppression and YOLOX head decoding in JAX.

The reference decodes YOLOX raw heads and runs NMS on the host with
torchvision (boxmot/detectors/yolox.py:113-300).  These are the
device-side equivalents: static-shape NMS via an iterative
suppress-the-max loop (exact greedy NMS semantics) and the grid/stride
decode of YOLOX outputs, both jit-friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from boxmot_tpu.ops.iou import iou_batch


@partial(jax.jit, static_argnames=("max_out",))
def nms(boxes, scores, iou_thresh, max_out: int = 128):
    """Greedy NMS.  boxes: (N, 4) xyxy; scores: (N,), invalid entries must
    carry score <= 0.  Returns (keep_idx (max_out,) int32 with -1 padding,
    keep_mask (max_out,))."""
    N = boxes.shape[0]
    iou = iou_batch(boxes, boxes)

    def body(state):
        alive, out_idx, out_n = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked).astype(jnp.int32)
        ok = masked[best] > 0
        out_idx = out_idx.at[out_n].set(jnp.where(ok, best, -1))
        out_n = out_n + ok.astype(jnp.int32)
        # suppress neighbours of the chosen box
        suppress = iou[best] > iou_thresh
        alive = alive & ~suppress & (jnp.arange(N) != best)
        alive = alive & ok  # once nothing valid remains, stop changing
        return alive, out_idx, out_n

    def cond(state):
        alive, _, out_n = state
        return jnp.any(jnp.where(alive, scores, -jnp.inf) > 0) & (out_n < max_out)

    alive0 = scores > 0
    out_idx0 = jnp.full((max_out,), -1, jnp.int32)
    _, keep, n = jax.lax.while_loop(cond, body, (alive0, out_idx0, jnp.int32(0)))
    return keep, jnp.arange(max_out) < n


def batched_class_nms(boxes, scores, classes, iou_thresh, max_out: int = 128):
    """Per-class NMS via the coordinate-offset trick (torchvision
    batched_nms semantics): boxes of different classes never suppress
    each other."""
    offset = classes.astype(jnp.float32)[:, None] * 4096.0
    shifted = boxes + offset
    return nms(shifted, scores, iou_thresh, max_out)


def yolox_decode(raw, strides=(8, 16, 32), img_hw=(640, 640)):
    """Decode raw YOLOX head output (N_anchors, 5 + num_classes) laid out
    over stride grids into absolute xyxy boxes + obj/cls scores
    (yolox.py:225-260 decode semantics)."""
    hw = [(img_hw[0] // s, img_hw[1] // s) for s in strides]
    grids = []
    stride_arr = []
    for (h, w), s in zip(hw, strides):
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        grid = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)
        grids.append(grid)
        stride_arr.append(jnp.full((h * w, 1), s, jnp.float32))
    grid = jnp.concatenate(grids, axis=0).astype(jnp.float32)
    stride = jnp.concatenate(stride_arr, axis=0)

    xy = (raw[..., :2] + grid) * stride
    wh = jnp.exp(raw[..., 2:4]) * stride
    x1y1 = xy - wh / 2
    x2y2 = xy + wh / 2
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    obj = jax.nn.sigmoid(raw[..., 4:5])
    cls = jax.nn.sigmoid(raw[..., 5:])
    return boxes, obj[..., 0], cls
