"""Pallas rotated-IoU kernel vs the jnp clip (ops/rotated_iou.py).

The kernel is the production path for large OBB IoU matrices on TPU
(iou_batch_obb dispatches to it above _PALLAS_MIN_PAIRS); these tests
run it in interpret mode on CPU against the XLA formulation, which is
itself differentially pinned against the actual reference's
cv2.rotatedRectangleIntersection loop in
tests/test_reference_parity_ops.py.

Measured on the real chip (tools/bench_pallas_obb.py): identical to
1.2e-7 at 1024^2; 2.1x faster at 2048^2 (70 vs 149 ms/call); and the
only path that runs at >= 4096^2, where the jnp clip's (N, M, 64, 2)
HBM temporaries exceed a v5e's 16 GB (measured 20.79 G requested).
"""

import numpy as np
import pytest


def _obbs(n, rng, wmax=200.0):
    b = np.zeros((n, 5), np.float32)
    b[:, 0] = rng.uniform(0, 1920, n)
    b[:, 1] = rng.uniform(0, 1080, n)
    b[:, 2] = rng.uniform(5, wmax, n)
    b[:, 3] = rng.uniform(5, wmax, n)
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return b


class TestPallasRotatedIoU:
    def test_single_tile_matches_jnp(self):
        from boxmot_tpu.ops.pallas_rotated_iou import rotated_iou_pallas
        from boxmot_tpu.ops.rotated_iou import iou_batch_obb

        rng = np.random.default_rng(0)
        a, b = _obbs(64, rng), _obbs(128, rng)
        ref = np.asarray(iou_batch_obb(a, b))
        got = np.asarray(rotated_iou_pallas(a, b, interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_padded_ragged_shapes(self):
        from boxmot_tpu.ops.pallas_rotated_iou import rotated_iou_pallas
        from boxmot_tpu.ops.rotated_iou import iou_batch_obb

        rng = np.random.default_rng(1)
        for n, m in [(5, 3), (70, 17), (1, 129)]:
            a, b = _obbs(n, rng), _obbs(m, rng)
            ref = np.asarray(iou_batch_obb(a, b))
            got = np.asarray(rotated_iou_pallas(a, b, interpret=True))
            assert got.shape == (n, m)
            np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_self_iou_diagonal_is_one(self):
        from boxmot_tpu.ops.pallas_rotated_iou import rotated_iou_pallas

        rng = np.random.default_rng(2)
        a = _obbs(40, rng)
        d = np.asarray(rotated_iou_pallas(a, a, interpret=True)).diagonal()
        assert d.min() > 0.999

    def test_disjoint_and_degenerate(self):
        from boxmot_tpu.ops.pallas_rotated_iou import rotated_iou_pallas

        a = np.array([[0, 0, 10, 10, 0.3]], np.float32)
        b = np.array(
            [[1000, 1000, 10, 10, 1.0], [0, 0, 0, 0, 0.0]], np.float32
        )
        got = np.asarray(rotated_iou_pallas(a, b, interpret=True))
        np.testing.assert_allclose(got, [[0.0, 0.0]], atol=1e-7)

    @pytest.mark.slow
    def test_multi_tile_grid(self):
        from boxmot_tpu.ops.pallas_rotated_iou import rotated_iou_pallas
        from boxmot_tpu.ops.rotated_iou import iou_batch_obb

        rng = np.random.default_rng(3)
        a, b = _obbs(130, rng), _obbs(260, rng)  # 3 x 3 tile grid, ragged
        ref = np.asarray(iou_batch_obb(a, b))
        got = np.asarray(rotated_iou_pallas(a, b, interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5)
