"""YOLOX weight path + decode/NMS parity (VERDICT r1 item 10).

The torch checkpoint converter is exercised on real torch tensors in the
standard yolox naming (built by export_yolox, the inverse traversal), and
the axis conventions are validated *independently* by running torch's own
conv2d against the Flax conv on the same weights.  Decode+NMS is checked
against a from-the-definition numpy restatement of yolox postprocess
semantics (yolox/utils/boxes.py postprocess: conf = obj * cls, greedy NMS).
"""

from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from boxmot_tpu.models.yolox import (  # noqa: E402
    build_yolox,
    convert_yolox,
    export_yolox,
    yolox_key_spec,
)

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("name", ["yolox_nano", "yolox_s"])
def test_convert_roundtrip_exact(name):
    """export -> convert restores every tensor bit-exactly, and the spec
    covers the whole parameter tree (no silently unconverted weights)."""
    model = build_yolox(name, num_classes=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: torch.from_numpy(v.copy()) for k, v in export_yolox(variables, name).items()}
    back = convert_yolox({"model": {f"model.{k}": v for k, v in sd.items()}}, name, 3)

    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b_map = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(back["params"])
    }
    assert len(flat_a) == len(flat_b_map)
    for p, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), flat_b_map[jax.tree_util.keystr(p)])
    stats_a = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    stats_b = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(back["batch_stats"])
    }
    assert len(stats_a) == len(stats_b)
    for p, v in stats_a:
        np.testing.assert_array_equal(np.asarray(v), stats_b[jax.tree_util.keystr(p)])


def test_convert_rejects_unknown_keys():
    model = build_yolox("yolox_nano", num_classes=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = export_yolox(variables, "yolox_nano")
    sd["head.bogus_preds.0.weight"] = np.zeros((1, 8, 1, 1), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        convert_yolox(sd, "yolox_nano", 1)


def test_conv_axes_match_torch_semantics():
    """Independent check of the OIHW<->HWIO mapping: torch's conv2d and the
    converted Flax conv must produce identical activations for the stem
    conv weights — a transpose bug cannot cancel across frameworks."""
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    w_torch = rng.normal(0, 0.1, (8, 3, 3, 3)).astype(np.float32)  # OIHW
    x = rng.normal(0, 1, (1, 3, 16, 16)).astype(np.float32)  # NCHW

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w_torch), padding=1).numpy()

    from boxmot_tpu.models.convert import _conv_kernel

    w_flax = _conv_kernel(w_torch)  # HWIO
    out = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(w_flax),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


def test_key_spec_matches_param_tree():
    """Every flax param path in the model is reachable from the spec and
    vice versa (structural completeness both directions)."""
    name = "yolox_s"
    model = build_yolox(name, num_classes=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    spec_paths = {fpath for _, fpath, _ in yolox_key_spec(name)}
    top_level = {p[0] for p in spec_paths}
    assert top_level == set(variables["params"].keys())


# ---------------------------------------------------------------------------
# decode + NMS parity vs canonical yolox postprocess semantics
# ---------------------------------------------------------------------------


def _np_yolox_postprocess(raw, img_hw, strides=(8, 16, 32), conf_thre=0.3,
                          nms_thre=0.5):
    """From-the-definition restatement of yolox decode + postprocess
    (yolox/models/yolo_head.py decode_outputs + yolox/utils/boxes.py
    postprocess, class-agnostic): grid decode, conf = obj * best-class,
    xywh->xyxy, greedy IoU NMS."""
    H, W = img_hw
    grids, strides_flat = [], []
    for s in strides:
        hs, ws = H // s, W // s
        yv, xv = np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij")
        grids.append(np.stack([xv, yv], -1).reshape(-1, 2))
        strides_flat.append(np.full((hs * ws, 1), s, np.float32))
    grids = np.concatenate(grids).astype(np.float32)
    strides_flat = np.concatenate(strides_flat)

    xy = (raw[:, :2] + grids) * strides_flat
    wh = np.exp(raw[:, 2:4]) * strides_flat
    obj = 1.0 / (1.0 + np.exp(-raw[:, 4]))
    cls = 1.0 / (1.0 + np.exp(-raw[:, 5:]))
    cls_conf = cls.max(-1)
    cls_id = cls.argmax(-1)
    score = obj * cls_conf
    boxes = np.concatenate([xy - wh / 2.0, xy + wh / 2.0], -1)

    keep = score >= conf_thre
    boxes, score, cls_id = boxes[keep], score[keep], cls_id[keep]
    order = np.argsort(-score, kind="stable")
    selected = []
    while len(order):
        i = order[0]
        selected.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a + b - inter, 1e-9)
        order = rest[iou <= nms_thre]
    sel = np.array(selected, int)
    return boxes[sel], score[sel], cls_id[sel]


def test_decode_nms_parity_vs_reference_semantics():
    from boxmot_tpu.ops.nms import nms as nms_op, yolox_decode

    img_hw = (128, 128)
    n_anchors = sum((img_hw[0] // s) * (img_hw[1] // s) for s in (8, 16, 32))
    rng = np.random.default_rng(3)
    raw = rng.normal(0, 1.0, (n_anchors, 5 + 2)).astype(np.float32)
    # suppress the background sea, then boost a handful of strong anchors
    # (keeps survivors well under the in-graph max_out=128 cap so the
    # comparison is about semantics, not truncation)
    raw[:, 4] -= 5.0
    strong = rng.choice(n_anchors, 60, replace=False)
    raw[strong, 4] += 9.0
    raw[strong, 5] += 4.0

    ref_boxes, ref_score, ref_cls = _np_yolox_postprocess(
        raw, img_hw, conf_thre=0.3, nms_thre=0.5
    )

    boxes, obj, cls = yolox_decode(jnp.asarray(raw), img_hw=img_hw)
    cls_conf = jnp.max(cls, axis=-1)
    cls_id = jnp.argmax(cls, axis=-1)
    score = obj * cls_conf
    valid = score >= 0.3
    keep_idx, keep_mask = nms_op(boxes, jnp.where(valid, score, -1.0), 0.5, 128)
    idx = np.asarray(keep_idx)[np.asarray(keep_mask)]
    got_boxes = np.asarray(boxes)[idx]
    got_score = np.asarray(score)[idx]
    got_cls = np.asarray(cls_id)[idx]

    assert len(got_boxes) == len(ref_boxes)
    order_ref = np.lexsort((ref_boxes[:, 0], -ref_score))
    order_got = np.lexsort((got_boxes[:, 0], -got_score))
    np.testing.assert_allclose(
        got_boxes[order_got], ref_boxes[order_ref], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        got_score[order_got], ref_score[order_ref], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(got_cls[order_got], ref_cls[order_ref])


def test_torch_checkpoint_file_loads(tmp_path):
    """End-to-end: a .pth file written by torch loads through the converter
    (the load_state_dict torch path has never before seen a real file)."""
    name = "yolox_nano"
    model = build_yolox(name, num_classes=1)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    sd = {
        f"model.{k}": torch.from_numpy(v.copy())
        for k, v in export_yolox(variables, name).items()
    }
    path = tmp_path / "yolox_nano.pth"
    torch.save({"model": sd}, path)
    back = convert_yolox(str(path), name, 1)
    ka = jax.tree_util.tree_leaves(variables["params"])
    kb = jax.tree_util.tree_leaves(back["params"])
    assert len(ka) == len(kb)
    total = sum(np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in zip(ka, kb))
    assert total == 0.0
