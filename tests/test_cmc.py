"""Camera-motion compensation estimators: ORB / SIFT / SOF / registry."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.motion.cmc import NoCMC, create_cmc, get_cmc_method

FRAME = Path(__file__).parent.parent / "assets" / "MOT17-mini" / "train" / (
    "MOT17-02-FRCNN"
) / "img1" / "000001.jpg"


def _load_frame():
    import cv2

    img = cv2.imread(str(FRAME))
    # quarter-res keeps the feature pipelines fast in tests
    return cv2.resize(img, (480, 270))


@pytest.mark.parametrize("name", ["orb", "sof"])
def test_known_shift_recovered(name):
    img = _load_frame()
    cmc = create_cmc(name, scale=0.5)
    w0 = cmc.apply(img)
    np.testing.assert_allclose(w0, np.eye(2, 3), atol=1e-6)  # first frame
    shifted = np.roll(img, (4, 7), axis=(0, 1))  # down 4, right 7
    w = cmc.apply(shifted)
    np.testing.assert_allclose(w[:2, :2], np.eye(2), atol=0.05)
    np.testing.assert_allclose([w[0, 2], w[1, 2]], [7, 4], atol=1.5)


def test_sift_reference_params_noop_but_usable_when_tuned():
    img = _load_frame()
    # reference contrastThreshold=0.5 detects ~no keypoints -> identity
    cmc = create_cmc("sift")
    cmc.apply(img)
    w = cmc.apply(np.roll(img, (4, 7), axis=(0, 1)))
    np.testing.assert_allclose(w, np.eye(2, 3), atol=1e-6)
    # with the cv2 default threshold it recovers the shift
    cmc = create_cmc("sift", scale=0.5, contrast_threshold=0.04)
    cmc.apply(img)
    w = cmc.apply(np.roll(img, (4, 7), axis=(0, 1)))
    np.testing.assert_allclose([w[0, 2], w[1, 2]], [7, 4], atol=1.5)


def test_detection_mask_suppresses_matches():
    img = _load_frame()
    cmc = create_cmc("orb", scale=0.5)
    full = np.array([[0, 0, img.shape[1], img.shape[0]]], np.float32)
    cmc.apply(img, full)
    w = cmc.apply(np.roll(img, (4, 7), axis=(0, 1)), full)
    # everything masked out -> no features -> identity
    np.testing.assert_allclose(w, np.eye(2, 3), atol=1e-6)


def test_registry():
    assert get_cmc_method("ORB").__name__ == "ORB"
    assert get_cmc_method("sof").__name__ == "SOF"
    assert isinstance(create_cmc("none"), NoCMC)
    with pytest.raises(ValueError, match="Unknown cmc_method"):
        get_cmc_method("homography")
