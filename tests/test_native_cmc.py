"""Native ECC camera-motion compensation: warp accuracy + tracker wiring."""

import numpy as np
import pytest

from boxmot_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


def _textured(seed=0, hw=(240, 320)):
    """Smooth, non-periodic random texture so ECC has clean gradients
    (blocky/periodic patterns alias into wrong minima for ANY ECC —
    the device estimator converges to the same wrong warp)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    smooth = gaussian_filter(rng.uniform(0, 255, hw), 6.0)
    smooth = (smooth - smooth.min()) / max(np.ptp(smooth), 1e-9) * 255
    return np.repeat(smooth[:, :, None], 3, axis=2).astype(np.uint8)


class TestWarp:
    def test_translation_recovery(self):
        from boxmot_tpu.native.trackers import NativeECC

        img = _textured()
        shift = (6, 10)  # (dy, dx)
        moved = np.roll(np.roll(img, shift[0], axis=0), shift[1], axis=1)
        ecc = NativeECC(scale=0.5)
        w0 = ecc.apply(img)
        np.testing.assert_allclose(w0, np.eye(2, 3), atol=1e-6)  # first frame
        w1 = ecc.apply(moved)
        # warp maps prev -> curr coordinates
        assert abs(w1[0, 2] - shift[1]) < 1.0, w1
        assert abs(w1[1, 2] - shift[0]) < 1.0, w1

    def test_matches_device_ecc(self):
        from boxmot_tpu.motion.cmc import ECC
        from boxmot_tpu.native.trackers import NativeECC

        img = _textured(seed=3)
        moved = np.roll(np.roll(img, 4, axis=0), -7, axis=1)
        dev = ECC(scale=0.5)
        nat = NativeECC(scale=0.5)
        dev.apply(img)
        nat.apply(img)
        wd = dev.apply(moved)
        wn = nat.apply(moved)
        np.testing.assert_allclose(wn[:, 2], wd[:, 2], atol=0.5)

    def test_flat_image_is_identity(self):
        from boxmot_tpu.native.trackers import NativeECC

        ecc = NativeECC()
        flat = np.zeros((120, 160, 3), np.uint8)
        ecc.apply(flat)
        w = ecc.apply(flat)
        np.testing.assert_allclose(w, np.eye(2, 3), atol=1e-4)


class TestTrackerCmc:
    @pytest.mark.parametrize("name", ["botsort", "boosttrack", "occluboost"])
    def test_pan_scene_parity(self, name):
        """Camera pan: cpp cores with native ECC match the device
        programs with the device ECC (same scene, both compensating)."""
        from boxmot_tpu.trackers.zoo import create_tracker

        bg = _textured(seed=1, hw=(240, 320))
        dev_kw = {"use_cmc": True, "cmc_method": "ecc"}
        if name == "botsort":
            dev_kw["with_reid"] = False
        jax_trk = create_tracker(name, **dev_kw)
        cpp_trk = create_tracker(f"{name}:cpp", use_cmc=True)
        pan = np.array([3, 1], np.float64)  # (dx, dy) per frame
        boxes0 = np.array(
            [[40, 50, 100, 170], [180, 90, 240, 210]], np.float64
        )
        for f in range(15):
            img = np.roll(
                np.roll(bg, int(round(pan[1] * f)), axis=0),
                int(round(pan[0] * f)),
                axis=1,
            )
            # objects static in the world = moving with the pan in image
            b = boxes0 + np.tile(pan * f, 2)
            dets = np.column_stack(
                [b, [0.9, 0.85], [0.0, 0.0]]
            ).astype(np.float32)
            out_j = np.asarray(jax_trk.update(dets, img))
            out_c = np.asarray(cpp_trk.update(dets, img))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}"
            for tid, rj in ids_j.items():
                np.testing.assert_allclose(
                    ids_c[tid][:4], rj[:4], atol=2.0,
                    err_msg=f"frame {f} id {tid}",
                )
