"""IoU family kernels vs independent numpy mirrors of the reference formulas
(boxmot/trackers/association/iou.py:134-386)."""

import numpy as np
import pytest

from boxmot_tpu.ops import iou as I

RNG = np.random.default_rng(42)


def rand_boxes(n):
    x1 = RNG.uniform(0, 800, n)
    y1 = RNG.uniform(0, 600, n)
    w = RNG.uniform(5, 150, n)
    h = RNG.uniform(5, 150, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def np_iou(b1, b2):
    b1 = b1[:, None]
    b2 = b2[None, :]
    xx1 = np.maximum(b1[..., 0], b2[..., 0])
    yy1 = np.maximum(b1[..., 1], b2[..., 1])
    xx2 = np.minimum(b1[..., 2], b2[..., 2])
    yy2 = np.minimum(b1[..., 3], b2[..., 3])
    wh = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return wh / (a1 + a2 - wh)


def test_iou_matches_reference_formula():
    a, b = rand_boxes(17), rand_boxes(23)
    np.testing.assert_allclose(
        np.asarray(I.iou_batch(a, b)), np_iou(a, b), rtol=1e-5, atol=1e-6
    )


def test_iou_identity_and_disjoint():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [5, 0, 15, 10]], np.float32)
    out = np.asarray(I.iou_batch(a, b))[0]
    np.testing.assert_allclose(out, [1.0, 0.0, 50.0 / 150.0], atol=1e-6)


def test_giou_range_and_identity():
    a, b = rand_boxes(11), rand_boxes(13)
    g = np.asarray(I.giou_batch(a, b))
    assert np.all(g >= 0) and np.all(g <= 1)
    self_g = np.asarray(I.giou_batch(a, a)).diagonal()
    np.testing.assert_allclose(self_g, 1.0, atol=1e-5)


def test_giou_known_value():
    # Two unit squares side by side: iou=0, enclose=2, union=2 -> giou=0 -> 0.5
    a = np.array([[0, 0, 1, 1]], np.float32)
    b = np.array([[1, 0, 2, 1]], np.float32)
    np.testing.assert_allclose(np.asarray(I.giou_batch(a, b))[0, 0], 0.5, atol=1e-6)


def test_diou_ciou_identity():
    a = rand_boxes(9)
    np.testing.assert_allclose(
        np.asarray(I.diou_batch(a, a)).diagonal(), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(I.ciou_batch(a, a)).diagonal(), 1.0, atol=1e-4
    )


def test_hmiou_reference_formula():
    a, b = rand_boxes(7), rand_boxes(9)
    b1 = a[:, None]
    b2 = b[None, :]
    ih = np.maximum(0, np.minimum(b1[..., 3], b2[..., 3]) - np.maximum(b1[..., 1], b2[..., 1]))
    uh = np.maximum(1e-10, np.maximum(b1[..., 3], b2[..., 3]) - np.minimum(b1[..., 1], b2[..., 1]))
    expected = np_iou(a, b) * ih / uh
    np.testing.assert_allclose(
        np.asarray(I.hmiou_batch(a, b)), expected, rtol=1e-4, atol=1e-6
    )


def test_centroid_batch():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [30, 40, 40, 50]], np.float32)
    out = np.asarray(I.centroid_batch(a, b, 100, 100))[0]
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
    # centers (5,5) and (35,45): dist 50, norm sqrt(2)*100
    np.testing.assert_allclose(out[1], 1 - 50 / (100 * np.sqrt(2)), atol=1e-5)


def test_get_asso_func_registry():
    assert I.get_asso_func("iou") is I.iou_batch
    fn = I.get_asso_func("centroid", 640, 480)
    a = rand_boxes(3)
    assert np.asarray(fn(a, a)).shape == (3, 3)
    with pytest.raises(ValueError):
        I.get_asso_func("bogus")
    with pytest.raises(ValueError):
        I.get_asso_func("centroid")


class TestRotatedIoU:
    def test_axis_aligned_matches_aabb(self):
        n, m = 8, 9
        boxes_a = rand_boxes(n)
        boxes_b = rand_boxes(m)

        def to_obb(b):
            cx = (b[:, 0] + b[:, 2]) / 2
            cy = (b[:, 1] + b[:, 3]) / 2
            w = b[:, 2] - b[:, 0]
            h = b[:, 3] - b[:, 1]
            return np.stack([cx, cy, w, h, np.zeros(len(b))], axis=-1).astype(np.float32)

        expected = np_iou(boxes_a, boxes_b)
        got = np.asarray(I.iou_batch_obb(to_obb(boxes_a), to_obb(boxes_b)))
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_identical_rotated(self):
        obb = np.array([[50, 50, 20, 10, 0.7], [10, 10, 8, 4, -1.2]], np.float32)
        out = np.asarray(I.iou_batch_obb(obb, obb))
        np.testing.assert_allclose(np.diag(out), 1.0, atol=1e-4)

    def test_rotation_invariance(self):
        # IoU of a pair is invariant to rotating both boxes about the origin.
        base = np.array(
            [[0.0, 0.0, 20.0, 10.0, 0.3], [5.0, 2.0, 15.0, 12.0, -0.4]], np.float32
        )
        ref = np.asarray(I.iou_batch_obb(base[:1], base[1:]))[0, 0]
        for phi in (0.5, 1.3, 2.9):
            c, s = np.cos(phi), np.sin(phi)
            rot = base.copy()
            rot[:, 0] = base[:, 0] * c - base[:, 1] * s
            rot[:, 1] = base[:, 0] * s + base[:, 1] * c
            rot[:, 4] = base[:, 4] + phi
            got = np.asarray(I.iou_batch_obb(rot[:1], rot[1:]))[0, 0]
            np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_crossing_rectangles(self):
        # Plus-sign: 20x2 horizontal vs 2x20 vertical centered at origin.
        # Intersection = 2x2 = 4; union = 40 + 40 - 4 = 76.
        a = np.array([[0, 0, 20, 2, 0.0]], np.float32)
        b = np.array([[0, 0, 20, 2, np.pi / 2]], np.float32)
        got = np.asarray(I.iou_batch_obb(a, b))[0, 0]
        np.testing.assert_allclose(got, 4.0 / 76.0, atol=1e-5)

    def test_45_degree_square_overlap(self):
        # Unit square vs same square rotated 45 deg about its center:
        # intersection is a regular octagon with area 2*(sqrt(2)-1).
        a = np.array([[0, 0, 1, 1, 0.0]], np.float32)
        b = np.array([[0, 0, 1, 1, np.pi / 4]], np.float32)
        inter = 2 * (np.sqrt(2) - 1)
        expected = inter / (2 - inter)
        got = np.asarray(I.iou_batch_obb(a, b))[0, 0]
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_disjoint(self):
        a = np.array([[0, 0, 4, 2, 0.3]], np.float32)
        b = np.array([[100, 100, 4, 2, 1.0]], np.float32)
        got = np.asarray(I.iou_batch_obb(a, b))[0, 0]
        assert got == 0.0

    def test_containment(self):
        a = np.array([[0, 0, 10, 10, 0.2]], np.float32)
        b = np.array([[0, 0, 2, 2, 0.9]], np.float32)
        got = np.asarray(I.iou_batch_obb(a, b))[0, 0]
        np.testing.assert_allclose(got, 4.0 / 100.0, atol=1e-5)


class TestPallasFusedCost:
    # local imports: the module header only pulls specific asso funcs
    def _boxes(self, n, rng):
        b = np.zeros((n, 4), np.float32)
        b[:, :2] = rng.uniform(0, 500, (n, 2))
        b[:, 2:] = b[:, :2] + rng.uniform(10, 100, (n, 2))
        return b

    def test_interpret_matches_jnp(self):
        import jax.numpy as jnp

        from boxmot_tpu.ops.pallas_kernels import (
            _fused_iou_cost_jnp,
            fused_iou_cost,
        )

        rng = np.random.default_rng(0)
        trk = self._boxes(64, rng)
        det = self._boxes(32, rng)
        conf = rng.uniform(0.1, 1, 32).astype(np.float32)
        iou_p, cost_p = fused_iou_cost(trk, det, conf, interpret=True)
        iou_j, cost_j = _fused_iou_cost_jnp(
            jnp.asarray(trk), jnp.asarray(det), jnp.asarray(conf)
        )
        np.testing.assert_allclose(np.asarray(iou_p), np.asarray(iou_j), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cost_p), np.asarray(cost_j), atol=1e-6)

    def test_default_path_matches_iou_batch(self):
        import jax.numpy as jnp

        from boxmot_tpu.ops.iou import iou_batch
        from boxmot_tpu.ops.pallas_kernels import fused_iou_cost

        rng = np.random.default_rng(1)
        trk = self._boxes(16, rng)
        det = self._boxes(16, rng)
        conf = np.ones(16, np.float32)
        iou, cost = fused_iou_cost(trk, det, conf)
        ref = np.asarray(iou_batch(jnp.asarray(trk), jnp.asarray(det)))
        np.testing.assert_allclose(np.asarray(iou), ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cost), 1.0 - ref, atol=1e-5)
