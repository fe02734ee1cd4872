"""Differential ops parity: association kernels vs the ACTUAL reference.

The reference's AssociationFunction (trackers/association/iou.py:118-410),
OBB IoU matrix (iou.py:5-116, cv2 rotatedRectangleIntersection) and
cost-limited linear assignment (matching.py:28-43, lap.lapjv via the scipy
shim) run here for real.  These tests hit the kernel layer directly —
complementing the tracker-level differential suite — on broad random box
populations, so any numeric drift in an IoU family member or an
assignment-semantics change fails at its source.
"""

import numpy as np
import pytest

from tests.refshim import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

if reference_available():
    load_reference()


W, H = 1920.0, 1080.0


def random_aabbs(n, seed, w=W, h=H):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, [w - 150, h - 150], (n, 2))
    wh = rng.uniform(10, 150, (n, 2))
    conf = rng.uniform(0.3, 1.0, (n, 1))
    return np.concatenate([xy, xy + wh, conf], axis=1)


def random_obbs(n, seed, w=W, h=H):
    rng = np.random.default_rng(seed)
    cxy = rng.uniform(100, [w - 100, h - 100], (n, 2))
    wh = rng.uniform(20, 120, (n, 2))
    theta = rng.uniform(-np.pi / 2, np.pi / 2, (n, 1))
    conf = rng.uniform(0.3, 1.0, (n, 1))
    return np.concatenate([cxy, wh, theta, conf], axis=1)


# ---------------------------------------------------------------------------
# AABB IoU family
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["iou", "hmiou", "giou", "ciou", "diou", "centroid"])
@pytest.mark.parametrize("seed", [0, 1])
def test_iou_family_parity(mode, seed):
    from boxmot.trackers.association.iou import AssociationFunction

    from boxmot_tpu.ops.iou import get_asso_func

    a = random_aabbs(23, seed)
    b = random_aabbs(17, seed + 100)
    # .run_asso_func is mis-decorated @staticmethod upstream; call the
    # resolved function directly
    ref = AssociationFunction(w=int(W), h=int(H), asso_mode=mode).asso_func(a, b)
    got = np.asarray(get_asso_func(mode, w=W, h=H)(a, b))
    assert got.shape == ref.shape == (23, 17)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_iou_family_degenerate_boxes():
    """Zero-area and coincident boxes must not diverge (NaN/inf handling)."""
    from boxmot.trackers.association.iou import AssociationFunction

    from boxmot_tpu.ops.iou import get_asso_func

    a = np.array(
        [
            [100, 100, 100, 100, 0.9],  # zero area
            [50, 50, 150, 150, 0.8],
            [50, 50, 150, 150, 0.7],  # duplicate
        ],
        np.float64,
    )
    # The reference giou_batch asserts the enclosing box is non-degenerate
    # (iou.py:240) and CRASHES on a zero-area self-pair; the repo kernel
    # returns a finite value instead of raising inside a jitted program.
    with pytest.raises(AssertionError):
        AssociationFunction(w=int(W), h=int(H), asso_mode="giou").asso_func(a, a)
    assert np.all(np.isfinite(np.asarray(get_asso_func("giou", w=W, h=H)(a, a))))

    for mode in ("iou", "diou", "ciou", "hmiou"):
        with np.errstate(invalid="ignore", divide="ignore"):
            ref = AssociationFunction(w=int(W), h=int(H), asso_mode=mode).asso_func(a, a)
        got = np.asarray(get_asso_func(mode, w=W, h=H)(a, a))
        # The reference's hmiou divides by a zero height-union on zero-area
        # boxes and emits NaN; the repo kernels are guarded (NaN inside an
        # XLA cost matrix would poison the whole assignment).  Parity is
        # asserted on every entry the reference defines; on the rest the
        # repo value must at least be finite.
        finite = np.isfinite(ref)
        np.testing.assert_allclose(got[finite], ref[finite], rtol=0, atol=2e-5, err_msg=mode)
        assert np.all(np.isfinite(got)), mode


# ---------------------------------------------------------------------------
# OBB IoU (reference: cv2.rotatedRectangleIntersection per pair;
# repo: in-graph polygon clipping)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [2, 3])
def test_obb_iou_parity(seed):
    from boxmot.trackers.association.iou import _iou_obb_matrix

    from boxmot_tpu.ops.rotated_iou import iou_batch_obb

    a = random_obbs(15, seed)
    b = random_obbs(12, seed + 100)
    ref = _iou_obb_matrix(a, b)
    got = np.asarray(iou_batch_obb(a, b))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)


def test_obb_iou_axis_aligned_and_identical():
    from boxmot.trackers.association.iou import _iou_obb_matrix

    from boxmot_tpu.ops.rotated_iou import iou_batch_obb

    a = np.array(
        [
            [200, 200, 80, 40, 0.0, 0.9],
            [200, 200, 80, 40, np.pi / 2, 0.9],  # same rect rotated 90°
            [500, 500, 60, 60, np.pi / 4, 0.8],
        ],
        np.float64,
    )
    ref = _iou_obb_matrix(a, a)
    got = np.asarray(iou_batch_obb(a, a))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# Cost-limited linear assignment (matching.py:28-43 — lap.lapjv
# cost_limit semantics via the scipy shim)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("shape", [(8, 8), (12, 5), (4, 15), (1, 1), (6, 0)])
def test_linear_assignment_parity(seed, shape):
    from boxmot.trackers.association.matching import linear_assignment as ref_la

    from boxmot_tpu.ops.lap import linear_assignment_np as repo_la

    rng = np.random.default_rng(seed * 31 + shape[0])
    # continuous random costs: ties have measure zero, so the optimal
    # matching is unique and both solvers must return the same set
    cost = rng.uniform(0, 1, shape)
    thresh = 0.6
    rm, ra, rb = ref_la(np.ascontiguousarray(cost), thresh)
    gm, ga, gb = repo_la(cost.copy(), thresh)
    assert sorted(map(tuple, np.asarray(rm).reshape(-1, 2).tolist())) == sorted(
        map(tuple, np.asarray(gm).reshape(-1, 2).tolist())
    )
    assert sorted(np.asarray(ra).tolist()) == sorted(np.asarray(ga).tolist())
    assert sorted(np.asarray(rb).tolist()) == sorted(np.asarray(gb).tolist())


def test_linear_assignment_cost_limit_blocks_expensive_pairs():
    from boxmot.trackers.association.matching import linear_assignment as ref_la

    from boxmot_tpu.ops.lap import linear_assignment_np as repo_la

    cost = np.array([[0.1, 0.9], [0.9, 0.1]])
    for thresh in (0.05, 0.5, 2.0):
        rm, ra, rb = ref_la(cost.copy(), thresh)
        gm, ga, gb = repo_la(cost.copy(), thresh)
        assert sorted(map(tuple, np.asarray(rm).reshape(-1, 2).tolist())) == sorted(
            map(tuple, np.asarray(gm).reshape(-1, 2).tolist())
        ), thresh


# ---------------------------------------------------------------------------
# fuse_score (matching.py:139 — detection-confidence fusion on similarity)
# ---------------------------------------------------------------------------


def test_fuse_score_parity():
    from types import SimpleNamespace

    from boxmot.trackers.association.matching import fuse_score as ref_fuse

    rng = np.random.default_rng(9)
    cost = rng.uniform(0, 1, (6, 9))
    confs = rng.uniform(0.2, 1.0, 9)
    dets = [SimpleNamespace(conf=c) for c in confs]
    ref = ref_fuse(cost.copy(), dets)
    # repo: fusion is fused into the tracker-step cost assembly —
    # similarity*conf re-expressed inline (trackers/bytetrack.py);
    # replicate the formula here to pin it against the reference
    sim = 1.0 - cost
    got = 1.0 - sim * confs[None, :]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)
