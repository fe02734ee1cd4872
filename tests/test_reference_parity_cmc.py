"""Differential CMC parity vs the ACTUAL reference implementation.

cv2 is available in this environment, so the reference's ECC/ORB/SIFT/SOF
estimators (boxmot/motion/cmc/{ecc,orb,sift,sof}.py) run for real.  Each
test drives the reference estimator and the repo estimator over the same
synthetic camera-pan sequence and asserts that both recover the same warp:
linear part ~identity, translation components within a pixel-level
tolerance of each other AND of the ground-truth shift.

Exact equality is not expected — the repo's ECC is a JAX Gauss-Newton
re-design (motion/cmc.py:58) and preprocessing resampling differs — so the
assertion is metric-bounded, mirroring how CMC quality actually affects
tracking (it feeds a KF mean/cov warp, not an exact-match contract).
"""

import numpy as np
import pytest

from tests.refshim import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

if reference_available():
    load_reference()

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------------------
# synthetic textured pan sequence
# ---------------------------------------------------------------------------


def textured_frame(h=480, w=640, seed=0):
    """Smooth random texture with strong corners: blurred noise + blobs."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h // 8, w // 8), dtype=np.uint8)
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (0, 0), 1.5)
    for _ in range(120):  # high-contrast blobs -> FAST/ShiTomasi corners
        x, y = int(rng.integers(20, w - 20)), int(rng.integers(20, h - 20))
        r = int(rng.integers(3, 9))
        v = int(rng.integers(0, 255))
        cv2.circle(img, (x, y), r, v, -1)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def shifted(img, tx, ty):
    M = np.array([[1, 0, tx], [0, 1, ty]], np.float32)
    h, w = img.shape[:2]
    return cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


PAN = [(0.0, 0.0), (4.0, -3.0), (9.0, -5.0), (12.0, -2.0), (8.0, 3.0)]


def run_sequence(cmc, frames, dets=None):
    """Returns the per-frame 2x3 warps (first frame primes the estimator)."""
    return [np.asarray(cmc.apply(f, dets), np.float32) for f in frames]


def frames_and_gt(seed=0):
    base = textured_frame(seed=seed)
    frames = [shifted(base, tx, ty) for tx, ty in PAN]
    # warp maps prev -> curr: frame-to-frame deltas
    deltas = [
        (PAN[i][0] - PAN[i - 1][0], PAN[i][1] - PAN[i - 1][1])
        for i in range(1, len(PAN))
    ]
    return frames, deltas


def check_warps(ref_warps, got_warps, deltas, tol_ref=1.5, tol_gt=2.0, sign=1.0):
    """Frame 0 primes; warps 1..N must agree with each other and with GT."""
    for k, (dx, dy) in enumerate(deltas, start=1):
        rw, gw = ref_warps[k], got_warps[k]
        assert rw.shape[0] == 2 and gw.shape == (2, 3)
        # linear parts ~identity (pure translation scene)
        np.testing.assert_allclose(gw[:2, :2], np.eye(2), atol=0.03)
        np.testing.assert_allclose(rw[:2, :2], np.eye(2), atol=0.03)
        # repo vs reference
        assert abs(gw[0, 2] - rw[0, 2]) <= tol_ref, (k, gw[:, 2], rw[:, 2])
        assert abs(gw[1, 2] - rw[1, 2]) <= tol_ref, (k, gw[:, 2], rw[:, 2])
        # reference vs ground truth (sanity that the oracle itself converged)
        assert abs(rw[0, 2] - sign * dx) <= tol_gt, (k, rw[:, 2], (dx, dy))
        assert abs(rw[1, 2] - sign * dy) <= tol_gt, (k, rw[:, 2], (dx, dy))


# ---------------------------------------------------------------------------
# ECC
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 5])
def test_ecc_translation_parity(seed):
    from boxmot.motion.cmc.ecc import ECC as RefECC

    from boxmot_tpu.motion.cmc import ECC as RepoECC

    frames, deltas = frames_and_gt(seed)
    # scale=0.35 keeps enough texture for both solvers at this fixture size
    ref = run_sequence(RefECC(scale=0.35, max_iter=100), frames)
    got = run_sequence(RepoECC(scale=0.35, max_iter=80), frames)
    check_warps(ref, got, deltas)


def test_ecc_first_frame_identity():
    from boxmot.motion.cmc.ecc import ECC as RefECC

    from boxmot_tpu.motion.cmc import ECC as RepoECC

    frame = textured_frame(seed=2)
    rw = np.asarray(RefECC(scale=0.35).apply(frame))
    gw = np.asarray(RepoECC(scale=0.35).apply(frame))
    np.testing.assert_allclose(rw[:2], np.eye(2, 3), atol=0)
    np.testing.assert_allclose(gw, np.eye(2, 3), atol=0)


# ---------------------------------------------------------------------------
# ORB
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [1, 6])
def test_orb_translation_parity(seed):
    from boxmot.motion.cmc.orb import ORB as RefORB

    from boxmot_tpu.motion.cmc import ORB as RepoORB

    frames, deltas = frames_and_gt(seed)
    ref = run_sequence(RefORB(scale=0.5), frames)
    got = run_sequence(RepoORB(scale=0.5), frames)
    check_warps(ref, got, deltas)


def test_orb_detection_mask_parity():
    """Both sides must ignore keypoints inside detection boxes."""
    from boxmot.motion.cmc.orb import ORB as RefORB

    from boxmot_tpu.motion.cmc import ORB as RepoORB

    frames, deltas = frames_and_gt(3)
    dets = np.array([[100.0, 100.0, 300.0, 300.0], [400.0, 50.0, 600.0, 250.0]])
    ref = run_sequence(RefORB(scale=0.5), frames, dets=dets)
    got = run_sequence(RepoORB(scale=0.5), frames, dets=dets)
    check_warps(ref, got, deltas)


# ---------------------------------------------------------------------------
# SIFT
# ---------------------------------------------------------------------------


def test_sift_default_contrast_degenerate_parity():
    """The reference ships contrastThreshold=0.5 (sift.py:19-40), which
    detects no keypoints at CMC scales — both sides must degrade to the
    identity warp rather than diverging."""
    from boxmot.motion.cmc.sift import SIFT as RefSIFT

    from boxmot_tpu.motion.cmc import SIFT as RepoSIFT

    frames, _ = frames_and_gt(4)
    ref = run_sequence(RefSIFT(scale=0.15), frames)
    got = run_sequence(RepoSIFT(scale=0.15), frames)
    for rw, gw in zip(ref, got):
        np.testing.assert_allclose(rw[:2], np.eye(2, 3), atol=0)
        np.testing.assert_allclose(gw, np.eye(2, 3), atol=0)


# ---------------------------------------------------------------------------
# SOF
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [2, 7])
def test_sof_translation_parity(seed):
    from boxmot.motion.cmc.sof import SOF as RefSOF

    from boxmot_tpu.motion.cmc import SOF as RepoSOF

    frames, deltas = frames_and_gt(seed)
    ref = run_sequence(RefSOF(scale=0.5), frames)
    got = run_sequence(RepoSOF(scale=0.5), frames)
    check_warps(ref, got, deltas)
