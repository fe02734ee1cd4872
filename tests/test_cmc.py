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


def _smooth_frame(seed=0, hw=(240, 320)):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    s = gaussian_filter(rng.uniform(0, 255, hw), 3.0)
    s = (s - s.min()) / max(np.ptp(s), 1e-9) * 255
    return np.repeat(s[:, :, None], 3, axis=2).astype(np.uint8)


class TestSofNumpyFallback:
    """The cv2-free SOF path (hermetic hosts): Shi-Tomasi + pyramidal LK
    + RANSAC similarity with the same gates as the cv2 pipeline."""

    def _numpy_sof(self, **kw):
        sof = create_cmc("sof", **kw)
        sof._has_cv2 = False  # force the fallback even if cv2 exists
        return sof

    def test_known_shift_recovered(self):
        img = _smooth_frame()
        sof = self._numpy_sof(scale=0.5)
        w0 = sof.apply(img)
        np.testing.assert_allclose(w0, np.eye(2, 3), atol=1e-6)
        shifted = np.roll(img, (4, 7), axis=(0, 1))  # down 4, right 7
        w = sof.apply(shifted)
        assert abs(w[0, 2] - 7) < 1.5 and abs(w[1, 2] - 4) < 1.5, w
        # near-identity rotation/scale for a pure translation
        np.testing.assert_allclose(w[:, :2], np.eye(2), atol=0.02)

    def test_flat_image_identity(self):
        sof = self._numpy_sof(scale=0.5)
        flat = np.zeros((120, 160, 3), np.uint8)
        sof.apply(flat)
        w = sof.apply(flat)
        np.testing.assert_allclose(w, np.eye(2, 3), atol=1e-6)

    def test_detection_mask_excludes_boxes(self):
        img = _smooth_frame(seed=2)
        sof = self._numpy_sof(scale=0.5)
        dets = np.array([[0, 0, 320, 240]], np.float32)  # mask everything
        sof.apply(img, dets)
        w = sof.apply(np.roll(img, 5, axis=1), dets)
        # no usable features -> identity
        np.testing.assert_allclose(w, np.eye(2, 3), atol=1e-6)


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
