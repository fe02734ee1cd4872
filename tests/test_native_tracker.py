"""Native (C++) live tracker cores: contract + parity vs the device programs.

Mirror of the reference's native parity strategy (SURVEY.md §4: Py vs C++
benchmark metrics compared at CI level, replay protocol tests at unit
level) — here the C++ slot-bank core is compared frame-by-frame against
the JAX ByteTrack on synthetic scenes.
"""

import numpy as np
import pytest

from boxmot_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)

IMG = np.zeros((480, 640, 3), np.uint8)


def moving_scene(n_frames=40, n_obj=6, seed=0, drop_p=0.15, low_conf_p=0.25):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(50, 500, (n_obj, 2))
    vel = rng.uniform(-4, 4, (n_obj, 2))
    size = rng.uniform(30, 80, (n_obj, 2))
    frames = []
    for f in range(n_frames):
        dets = []
        for i in range(n_obj):
            p = pos[i] + vel[i] * f
            if not (0 < p[0] < 600 and 0 < p[1] < 440):
                continue
            if rng.uniform() < drop_p:
                continue
            jitter = rng.normal(0, 1.5, 2)
            x1, y1 = p + jitter
            w, h = size[i] * rng.uniform(0.95, 1.05, 2)
            conf = (
                rng.uniform(0.15, 0.44)
                if rng.uniform() < low_conf_p
                else rng.uniform(0.5, 0.95)
            )
            dets.append([x1, y1, x1 + w, y1 + h, conf, 0.0])
        frames.append(np.array(dets, np.float32).reshape(-1, 6))
    return frames


def make_native(**params):
    from boxmot_tpu.trackers.zoo import create_tracker

    return create_tracker("bytetrack:cpp", tracker_config=params)


class TestContract:
    def test_create_unknown(self):
        from boxmot_tpu.native.trackers import NativeTracker

        with pytest.raises(ValueError):
            NativeTracker("nosuchtracker")

    def test_first_frame_activation(self):
        trk = make_native()
        dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        out = trk.update(dets, IMG)
        assert out.shape == (1, 8)
        assert out.id[0] == 1
        assert out.det_ind[0] == 0

    def test_no_detections(self):
        trk = make_native()
        out = trk.update(np.empty((0, 6), np.float32), IMG)
        assert out.shape[0] == 0
        trk.update(np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32), IMG)
        out = trk.update(np.empty((0, 6), np.float32), IMG)
        assert out.shape[0] == 0

    def test_reset(self):
        trk = make_native()
        dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
        trk.update(dets, IMG)
        trk.update(dets, IMG)
        trk.reset()
        out = trk.update(dets, IMG)
        assert out.id[0] == 1  # id counter restarts

    def test_stable_ids(self):
        trk = make_native()
        for f in range(10):
            dets = np.array(
                [[10 + 2 * f, 10, 60 + 2 * f, 100, 0.9, 0.0]], np.float32
            )
            out = trk.update(dets, IMG)
            assert out.shape[0] == 1
            assert out.id[0] == 1

    def test_zoo_backend_suffix(self):
        from boxmot_tpu.native.trackers import NativeTracker

        trk = make_native(track_thresh=0.33, capacity=64)
        assert isinstance(trk, NativeTracker)
        assert trk.capacity == 64


class TestParityVsDevice:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_scene_parity(self, seed):
        from boxmot_tpu.trackers.bytetrack import ByteTrack

        frames = moving_scene(n_frames=40, n_obj=6, seed=seed)
        jax_trk = ByteTrack()
        cpp_trk = make_native()
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[5] == pytest.approx(rj[5], abs=1e-5)  # conf
                assert rc[7] == rj[7]  # det_ind

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("use_byte", [False, True])
    def test_ocsort_scene_parity(self, seed, use_byte):
        from boxmot_tpu.trackers.ocsort import OcSort
        from boxmot_tpu.trackers.zoo import create_tracker

        frames = moving_scene(n_frames=40, n_obj=6, seed=seed)
        jax_trk = OcSort(use_byte=use_byte)
        cpp_trk = create_tracker("ocsort:cpp", tracker_config={"use_byte": use_byte})
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[7] == rj[7]  # det_ind

    def test_ocsort_oru_occlusion_parity(self):
        """ORU frozen-state replay after a gap matches the device program."""
        from boxmot_tpu.trackers.ocsort import OcSort
        from boxmot_tpu.trackers.zoo import create_tracker

        jax_trk = OcSort()
        cpp_trk = create_tracker("ocsort:cpp")
        box = np.array([100, 100, 160, 220], np.float32)
        for f in range(25):
            if 8 <= f < 14:  # occluded gap triggers freeze + ORU on rejoin
                dets = np.empty((0, 6), np.float32)
            else:
                b = box + 4 * f * np.array([1, 0.5, 1, 0.5], np.float32)
                dets = np.array([[*b, 0.9, 0.0]], np.float32)
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}"
            if out_j.shape[0]:
                assert int(out_j[0, 4]) == int(out_c[0, 4])
                np.testing.assert_allclose(out_c[0, :4], out_j[0, :4], atol=0.5)

    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize(
        "plus_plus", [False, True], ids=["boosttrack", "boosttrack++"]
    )
    def test_boosttrack_scene_parity(self, seed, plus_plus):
        from boxmot_tpu.trackers.boosttrack import BoostTrack
        from boxmot_tpu.trackers.zoo import create_tracker

        extra = (
            {"use_rich_s": True, "use_sb": True, "use_vt": True, "s_sim_corr": True}
            if plus_plus
            else {}
        )
        frames = moving_scene(n_frames=40, n_obj=6, seed=seed, low_conf_p=0.35)
        # both sides built through the zoo so they share the default config
        jax_trk = create_tracker("boosttrack", use_cmc=False, **extra)
        assert isinstance(jax_trk, BoostTrack)
        cpp_trk = create_tracker("boosttrack:cpp", **extra)
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[7] == rj[7]  # det_ind

    @pytest.mark.parametrize("seed", [0, 1])
    def test_sfsort_scene_parity(self, seed):
        from boxmot_tpu.trackers.zoo import create_tracker

        kw = dict(central_timeout=10, marginal_timeout=4, frame_width=640, frame_height=480)
        frames = moving_scene(n_frames=40, n_obj=6, seed=seed, low_conf_p=0.3)
        jax_trk = create_tracker("sfsort", **kw)
        cpp_trk = create_tracker("sfsort:cpp", **kw)
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[7] == rj[7]

    def test_sfsort_dynamic_tuning_parity(self):
        from boxmot_tpu.trackers.zoo import create_tracker

        kw = dict(
            dynamic_tuning=True,
            high_th_m=0.05,
            new_track_th_m=0.04,
            match_th_first_m=0.05,
        )
        frames = moving_scene(n_frames=25, n_obj=8, seed=3, low_conf_p=0.3)
        jax_trk = create_tracker("sfsort", **kw)
        cpp_trk = create_tracker("sfsort:cpp", **kw)
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}"
            assert {int(r[4]) for r in out_j} == {int(r[4]) for r in out_c}

    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("fuse", [False, True])
    def test_botsort_scene_parity(self, seed, fuse):
        """Motion-only BotSort: cpp core vs device program."""
        from boxmot_tpu.trackers.botsort import BotSort
        from boxmot_tpu.trackers.zoo import create_tracker

        kw = dict(with_reid=False, use_cmc=False, fuse_first_associate=fuse)
        frames = moving_scene(n_frames=40, n_obj=6, seed=seed)
        jax_trk = create_tracker("botsort", **kw)
        assert isinstance(jax_trk, BotSort)
        cpp_trk = create_tracker("botsort:cpp", fuse_first_associate=fuse)
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[6] == rj[6]  # voted class
                assert rc[7] == rj[7]

    def test_botsort_class_voting_parity(self):
        """Confidence-weighted class votes flip the emitted class."""
        from boxmot_tpu.trackers.zoo import create_tracker

        kw = dict(with_reid=False, use_cmc=False)
        jax_trk = create_tracker("botsort", **kw)
        cpp_trk = create_tracker("botsort:cpp")
        box = [100, 100, 160, 220]
        # class 2 twice at low conf, then class 5 repeatedly at high conf
        seq = [(2, 0.65), (2, 0.66), (5, 0.95), (5, 0.95), (5, 0.95)]
        for cls_id, cf in seq:
            dets = np.array([[*box, cf, cls_id]], np.float32)
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0] == 1
            assert out_j[0, 6] == out_c[0, 6]
        assert out_c[0, 6] == 5.0

    @pytest.mark.parametrize("seed", [0, 1, 4])
    def test_occluboost_scene_parity(self, seed):
        """Motion-only OccluBoost (flagship): cpp core vs device program."""
        from boxmot_tpu.trackers.occluboost import OccluBoost
        from boxmot_tpu.trackers.zoo import create_tracker

        frames = moving_scene(n_frames=40, n_obj=6, seed=seed, low_conf_p=0.35)
        jax_trk = create_tracker("occluboost", use_cmc=False)
        assert isinstance(jax_trk, OccluBoost) and not jax_trk.with_reid
        cpp_trk = create_tracker("occluboost:cpp")
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[7] == rj[7]

    def test_occluboost_second_pass_parity(self):
        from boxmot_tpu.trackers.zoo import create_tracker

        kw = dict(use_second_pass=True, second_pass_min_hits=2)
        frames = moving_scene(n_frames=30, n_obj=5, seed=2, low_conf_p=0.45)
        jax_trk = create_tracker("occluboost", use_cmc=False, **kw)
        cpp_trk = create_tracker("occluboost:cpp", **kw)
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}"
            assert {int(r[4]) for r in out_j} == {int(r[4]) for r in out_c}

    def test_occluboost_confirmation_states(self):
        """Tentative tracks need confirm_hits matches before emission."""
        from boxmot_tpu.trackers.zoo import create_tracker

        kw = dict(instant_confirm_thresh=0.95, confirm_hits=2)
        jax_trk = create_tracker("occluboost", use_cmc=False, **kw)
        cpp_trk = create_tracker("occluboost:cpp", **kw)
        # conf 0.8: above new_track_thresh (0.713, reference tier) so a
        # track is born, below instant_confirm 0.95 so it starts tentative
        dets = np.array([[10, 10, 60, 110, 0.8, 0]], np.float32)
        emitted = []
        for f in range(4):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}"
            emitted.append(out_c.shape[0])
        assert emitted[0] == 0  # tentative on birth
        assert emitted[-1] == 1  # confirmed after repeated hits

    def test_sam2mot_scene_parity(self):
        """Mask tracker: the cpp core matches the device (host-numpy)
        Sam2Mot frame-by-frame, including mask memory."""
        from boxmot_tpu.trackers.sam2mot import Sam2Mot
        from boxmot_tpu.trackers.zoo import create_tracker

        hw = (120, 160)
        img = np.zeros((*hw, 3), np.uint8)

        def box_mask(b):
            m = np.zeros(hw, np.uint8)
            m[int(b[1]):int(b[3]), int(b[0]):int(b[2])] = 1
            return m

        jax_trk = Sam2Mot()
        cpp_trk = create_tracker("sam2mot:cpp")
        rng = np.random.default_rng(3)
        base = np.array([[10, 10, 40, 60], [90, 30, 130, 100]], np.float64)
        vel = np.array([[3, 1, 3, 1], [-2, 2, -2, 2]], np.float64)
        for f in range(20):
            boxes = base + vel * f
            keep = rng.uniform(size=2) > 0.1
            b = boxes[keep]
            confs = rng.uniform(0.6, 0.95, keep.sum())
            dets = np.column_stack([b, confs, np.zeros(keep.sum())]).astype(np.float32)
            masks = (
                np.stack([box_mask(bb) for bb in b])
                if len(b)
                else np.zeros((0, *hw), np.uint8)
            )
            out_j = jax_trk.update(dets, img, masks=masks)
            out_c = cpp_trk.update(dets, img, masks=masks)
            a, c = np.asarray(out_j), np.asarray(out_c)
            assert a.shape[0] == c.shape[0], f"frame {f}"
            ids_j = {int(r[4]): r for r in a}
            ids_c = {int(r[4]): r for r in c}
            assert set(ids_j) == set(ids_c), f"frame {f}"
            for tid, rj in ids_j.items():
                np.testing.assert_allclose(ids_c[tid][:4], rj[:4], atol=0.5)
            if out_j.masks is not None:
                assert out_c.masks is not None
                np.testing.assert_array_equal(out_c.masks, out_j.masks)

    def test_sam2mot_untracked_gate(self):
        """A duplicate detection inside an existing mask must not spawn."""
        from boxmot_tpu.trackers.zoo import create_tracker

        hw = (120, 160)
        img = np.zeros((*hw, 3), np.uint8)
        m = np.zeros(hw, np.uint8)
        m[10:80, 10:60] = 1
        trk = create_tracker("sam2mot:cpp")
        d = np.array([[10, 10, 60, 80, 0.9, 0.0]], np.float32)
        trk.update(d, img, masks=np.stack([m]))
        dets2 = np.array(
            [[10, 10, 60, 80, 0.9, 0.0], [20, 20, 50, 70, 0.85, 0.0]], np.float32
        )
        out = trk.update(dets2, img, masks=np.stack([m, m[...]]))
        assert sorted(np.asarray(out)[:, 4].astype(int).tolist()) == [1]

    @pytest.mark.parametrize("seed", [0, 1])
    def test_strongsort_scene_parity(self, seed):
        """No-model StrongSort: bank-presence appearance + Mahalanobis
        cascade matches the device program frame-by-frame."""
        from boxmot_tpu.trackers.strongsort import StrongSort
        from boxmot_tpu.trackers.zoo import create_tracker

        frames = moving_scene(n_frames=40, n_obj=6, seed=seed)
        jax_trk = create_tracker("strongsort")
        assert isinstance(jax_trk, StrongSort)
        cpp_trk = create_tracker("strongsort:cpp")
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[7] == rj[7]

    @pytest.mark.parametrize("seed", [0, 1])
    def test_deepocsort_scene_parity(self, seed):
        """No-model DeepOcSort: the all-ones embedding semantics and
        adaptive weighting match the device program frame-by-frame."""
        from boxmot_tpu.trackers.deepocsort import DeepOcSort
        from boxmot_tpu.trackers.zoo import create_tracker

        frames = moving_scene(n_frames=40, n_obj=6, seed=seed)
        jax_trk = create_tracker("deepocsort", cmc_off=True)
        assert isinstance(jax_trk, DeepOcSort)
        cpp_trk = create_tracker("deepocsort:cpp", cmc_off=True)
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[7] == rj[7]

    def test_deepocsort_cmc_pan_parity(self):
        """DeepOcSort with CMC holds ids under camera pan on both backends."""
        from scipy.ndimage import gaussian_filter

        from boxmot_tpu.trackers.zoo import create_tracker

        rng = np.random.default_rng(1)
        bg = gaussian_filter(rng.uniform(0, 255, (240, 320)), 6.0)
        bg = np.repeat(
            ((bg - bg.min()) / max(np.ptp(bg), 1e-9) * 255)[:, :, None], 3, 2
        ).astype(np.uint8)
        jax_trk = create_tracker("deepocsort")
        cpp_trk = create_tracker("deepocsort:cpp")
        pan = np.array([3, 1], np.float64)
        boxes0 = np.array([[40, 50, 100, 170], [180, 90, 240, 210]], np.float64)
        for f in range(15):
            img = np.roll(
                np.roll(bg, int(round(pan[1] * f)), 0), int(round(pan[0] * f)), 1
            )
            b = boxes0 + np.tile(pan * f, 2)
            dets = np.column_stack([b, [0.9, 0.85], [0.0, 0.0]]).astype(np.float32)
            out_j = np.asarray(jax_trk.update(dets, img))
            out_c = np.asarray(cpp_trk.update(dets, img))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}"
            assert {int(r[4]) for r in out_j} == {int(r[4]) for r in out_c}

    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("use_byte", [True, False])
    def test_hybridsort_scene_parity(self, seed, use_byte):
        """Motion-only HybridSort: score-aware XYSCR + corner velocities
        match the device program frame-by-frame."""
        from boxmot_tpu.trackers.hybridsort import HybridSort
        from boxmot_tpu.trackers.zoo import create_tracker

        frames = moving_scene(n_frames=40, n_obj=6, seed=seed, low_conf_p=0.3)
        # motion-only configuration (the YAML tier defaults with_reid=True)
        jax_trk = create_tracker("hybridsort", use_byte=use_byte, with_reid=False)
        assert isinstance(jax_trk, HybridSort) and not jax_trk.with_reid
        cpp_trk = create_tracker("hybridsort:cpp", use_byte=use_byte)
        for f, dets in enumerate(frames):
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[7] == rj[7]

    def test_hybridsort_oru_occlusion_parity(self):
        from boxmot_tpu.trackers.zoo import create_tracker

        jax_trk = create_tracker("hybridsort")
        cpp_trk = create_tracker("hybridsort:cpp")
        box = np.array([100, 100, 160, 220], np.float32)
        for f in range(25):
            if 8 <= f < 13:
                dets = np.empty((0, 6), np.float32)
            else:
                b = box + 4 * f * np.array([1, 0.5, 1, 0.5], np.float32)
                dets = np.array([[*b, 0.9, 0.0]], np.float32)
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}"
            if out_j.shape[0]:
                assert int(out_j[0, 4]) == int(out_c[0, 4]) == 1
                np.testing.assert_allclose(out_c[0, :4], out_j[0, :4], atol=0.5)

    def test_bytetrack_obb_scene_parity(self):
        """OBB layout inference + rotated tracking matches the device
        program frame-by-frame."""
        from boxmot_tpu.trackers.bytetrack import ByteTrack
        from boxmot_tpu.trackers.zoo import create_tracker

        rng = np.random.default_rng(5)
        jax_trk = ByteTrack()
        cpp_trk = create_tracker("bytetrack:cpp")
        base = np.array(
            [
                [100, 100, 60, 24, 0.3],
                [300, 150, 40, 80, -0.8],
                [200, 300, 70, 30, 1.2],
            ],
            np.float64,
        )
        vel = rng.uniform(-4, 4, (3, 2))
        for f in range(30):
            dets = base.copy()
            dets[:, :2] += vel * f
            dets[:, 4] += 0.02 * f
            dets[:, 2:4] *= rng.uniform(0.97, 1.03, (3, 2))
            keep = rng.uniform(size=3) > 0.15  # dropouts
            d = np.column_stack(
                [dets[keep], rng.uniform(0.6, 0.95, keep.sum()), np.zeros(keep.sum())]
            ).astype(np.float32)
            out_j = np.asarray(jax_trk.update(d, IMG))
            out_c = np.asarray(cpp_trk.update(d, IMG))
            assert cpp_trk.is_obb
            assert out_j.shape == out_c.shape, f"frame {f}"
            ids_j = {int(r[5]): r for r in out_j}
            ids_c = {int(r[5]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.7, err_msg=f"frame {f} id {tid} box"
                )
                assert abs(rc[4] - rj[4]) < 0.05, f"frame {f} id {tid} angle"
                assert rc[8] == rj[8]

    def test_ocsort_obb_scene_parity(self):
        """OC-SORT OBB: rotated IoU + 9-D XYSR filter matches the
        device program frame-by-frame, including ORU after a gap."""
        from boxmot_tpu.trackers.ocsort import OcSort
        from boxmot_tpu.trackers.zoo import create_tracker

        jax_trk = OcSort()
        cpp_trk = create_tracker("ocsort:cpp")
        for f in range(25):
            dets = []
            if not (8 <= f < 12):  # a gap for track 1 triggers ORU
                dets.append([100 + 5 * f, 100 + 2 * f, 60, 24, 0.3 + 0.02 * f, 0.9, 0])
            dets.append([300 - 4 * f, 220, 40, 80, -0.8 + 0.01 * f, 0.85, 0])
            d = np.array(dets, np.float32)
            out_j = np.asarray(jax_trk.update(d, IMG))
            out_c = np.asarray(cpp_trk.update(d, IMG))
            assert cpp_trk.is_obb
            assert out_j.shape == out_c.shape, f"frame {f}"
            ids_j = {int(r[5]): r for r in out_j}
            ids_c = {int(r[5]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.7, err_msg=f"frame {f} id {tid}"
                )
                assert abs(rc[4] - rj[4]) < 0.05, f"frame {f} id {tid} angle"

    def test_obb_unsupported_native_raises(self):
        from boxmot_tpu.trackers.zoo import create_tracker

        trk = create_tracker("botsort:cpp")
        dets = np.array([[100, 100, 60, 24, 0.4, 0.9, 0]], np.float32)
        with pytest.raises(AssertionError, match="OBB"):
            trk.update(dets, IMG)

    def test_sfsort_obb_scene_parity(self):
        """SFSORT OBB: rotated BBSI + damped theta matches the device
        program frame-by-frame."""
        from boxmot_tpu.trackers.sfsort import SFSORT
        from boxmot_tpu.trackers.zoo import create_tracker

        jax_trk = SFSORT()
        cpp_trk = create_tracker("sfsort:cpp")
        for f in range(25):
            dets = np.array(
                [
                    [100 + 5 * f, 100 + 2 * f, 60, 24, 0.3 + 0.02 * f, 0.9, 0],
                    [300 - 4 * f, 220, 40, 80, -0.8 + 0.01 * f, 0.85, 0],
                ],
                np.float32,
            )
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert cpp_trk.is_obb
            assert out_j.shape == out_c.shape, f"frame {f}"
            ids_j = {int(r[5]): r for r in out_j}
            ids_c = {int(r[5]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:5], rj[:5], atol=0.05, err_msg=f"frame {f} id {tid}"
                )

    def test_per_class_parity(self):
        """Per-class isolation on the cpp backend matches the device
        trackers' class-split states and reference-style global ids."""
        from boxmot_tpu.trackers.zoo import create_tracker

        jax_trk = create_tracker("bytetrack", per_class=True)
        cpp_trk = create_tracker("bytetrack:cpp", per_class=True)
        for f in range(15):
            dets = np.array(
                [
                    [10 + 3 * f, 10, 70 + 3 * f, 140, 0.9, 0.0],
                    [200, 30 + 2 * f, 260, 160 + 2 * f, 0.85, 2.0],
                    [400 - 2 * f, 100, 460 - 2 * f, 230, 0.8, 2.0],
                ],
                np.float32,
            )
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}"
            for tid, rj in ids_j.items():
                np.testing.assert_allclose(ids_c[tid][:4], rj[:4], atol=0.5)
        # reference semantics: one global creation counter across
        # classes (basetracker.py:228) — ids are small and sequential
        ids = sorted(int(r[4]) for r in out_c)
        assert ids == [1, 2, 3]
        # classes preserved per row, ids NOT namespaced by class
        assert sorted(int(r[6]) for r in out_c) == [0, 2, 2]

    def test_per_class_lost_tracks_age(self):
        """A class absent for a few frames still ages out its tracks."""
        from boxmot_tpu.trackers.zoo import create_tracker

        trk = create_tracker("bytetrack:cpp", per_class=True)
        d0 = np.array([[10, 10, 70, 140, 0.9, 0.0]], np.float32)
        d1 = np.array([[200, 30, 260, 160, 0.85, 1.0]], np.float32)
        trk.update(np.concatenate([d0, d1]), IMG)
        for _ in range(35):  # class 1 vanishes past max_time_lost (buffer 30)
            trk.update(d0, IMG)
        # two frames: the reborn class-1 track confirms on its 2nd match
        trk.update(np.concatenate([d0, d1]), IMG)
        out = trk.update(np.concatenate([d0, d1]), IMG)
        ids = sorted(int(r[4]) for r in np.asarray(out))
        # class-1 track died and was re-created with a fresh global id
        assert len(ids) == 2
        assert ids == [1, 3]

    def test_boosttrack_reid_rejected(self):
        from boxmot_tpu.native.trackers import NativeTracker

        # with_reid alone downgrades to motion-only (python gate parity);
        # an actual reid model is rejected
        NativeTracker("boosttrack", with_reid=True)
        with pytest.raises(ValueError):
            NativeTracker("boosttrack", reid_model=object())

    def test_occlusion_lost_recovery(self):
        """A track lost for a few frames keeps its id on the cpp core too."""
        from boxmot_tpu.trackers.bytetrack import ByteTrack

        jax_trk = ByteTrack()
        cpp_trk = make_native()
        box = [100, 100, 160, 220]
        frames = []
        for f in range(20):
            if 6 <= f < 11:  # occluded
                frames.append(np.empty((0, 6), np.float32))
            else:
                frames.append(
                    np.array([[*(np.array(box) + 3 * f * np.array([1, 0, 1, 0])), 0.9, 0.0]], np.float32)
                )
        for dets in frames:
            out_j = np.asarray(jax_trk.update(dets, IMG))
            out_c = np.asarray(cpp_trk.update(dets, IMG))
            assert out_j.shape[0] == out_c.shape[0]
            if out_j.shape[0]:
                assert int(out_j[0, 4]) == int(out_c[0, 4]) == 1


class _DummyReID:
    """Must never be consulted when embs are passed explicitly."""

    def get_features(self, *a, **k):  # pragma: no cover
        raise AssertionError("reid model must not be called when embs given")


def identity_emb_scene(n_frames=60, n_obj=5, dim=512, occl=(0, 15, 35), seed=0):
    """Moving objects with per-identity unit embeddings; object occl[0]
    vanishes for frames [occl[1], occl[2]) — long enough to bury it in
    the graveyard when max_age is small."""
    rng = np.random.default_rng(seed)
    bases = rng.normal(size=(n_obj, dim))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    pos = rng.uniform(60, 400, (n_obj, 2))
    vel = rng.uniform(-3, 3, (n_obj, 2))
    size = rng.uniform(40, 70, (n_obj, 2))
    frames, embss = [], []
    for f in range(n_frames):
        dets, embs = [], []
        for i in range(n_obj):
            if i == occl[0] and occl[1] <= f < occl[2]:
                continue
            if rng.uniform() < 0.1:
                continue
            p = pos[i] + vel[i] * f
            x1, y1 = p + rng.normal(0, 1.0, 2)
            w, h = size[i] * rng.uniform(0.97, 1.03, 2)
            conf = rng.uniform(0.55, 0.95)
            dets.append([x1, y1, x1 + w, y1 + h, conf, 0.0])
            e = bases[i] + 0.03 * rng.normal(size=dim)
            embs.append(e / np.linalg.norm(e))
        frames.append(np.array(dets, np.float32).reshape(-1, 6))
        embss.append(np.array(embs, np.float32).reshape(-1, dim))
    return frames, embss


class TestAppearanceParity:
    """Embeddings through the native cores (VERDICT r2 missing #2): the
    cpp appearance paths match the device programs row-for-row."""

    def _compare(self, jax_trk, cpp_trk, frames, embss):
        for f, (dets, embs) in enumerate(zip(frames, embss)):
            out_j = np.asarray(jax_trk.update(dets, IMG, embs=embs))
            out_c = np.asarray(cpp_trk.update(dets, IMG, embs=embs))
            assert out_j.shape[0] == out_c.shape[0], f"frame {f}: row count"
            ids_j = {int(r[4]): r for r in out_j}
            ids_c = {int(r[4]): r for r in out_c}
            assert set(ids_j) == set(ids_c), f"frame {f}: track ids"
            for tid, rj in ids_j.items():
                rc = ids_c[tid]
                np.testing.assert_allclose(
                    rc[:4], rj[:4], atol=0.5, err_msg=f"frame {f} id {tid} box"
                )
                assert rc[7] == rj[7]

    @pytest.mark.parametrize("seed", [0, 3])
    def test_botsort_appearance_parity(self, seed):
        """EMA smooth-feature bank + min(iou, emb) proximity-gated fusion."""
        from boxmot_tpu.trackers.zoo import create_tracker

        frames, embss = identity_emb_scene(n_frames=40, seed=seed)
        jax_trk = create_tracker(
            "botsort", use_cmc=False, with_reid=True, reid_model=_DummyReID()
        )
        cpp_trk = create_tracker("botsort:cpp", with_reid=True)
        self._compare(jax_trk, cpp_trk, frames, embss)

    @pytest.mark.parametrize("seed", [0, 3])
    def test_occluboost_appearance_parity(self, seed):
        """Fused ReID cost + emb>=0.75 validity rescue + recovery pass."""
        from boxmot_tpu.trackers.zoo import create_tracker

        frames, embss = identity_emb_scene(n_frames=40, occl=(0, 15, 22), seed=seed)
        kw = dict(with_reid=True)
        jax_trk = create_tracker(
            "occluboost", use_cmc=False, reid_model=_DummyReID(), **kw
        )
        assert jax_trk.with_reid and jax_trk.cfg.with_reid
        cpp_trk = create_tracker("occluboost:cpp", **kw)
        self._compare(jax_trk, cpp_trk, frames, embss)

    def test_occluboost_graveyard_resurrection_parity(self):
        """Online GTA: burial, appearance resurrection with id reuse, and
        gap-interpolation rows match the device program, including the
        host-side GP smoothing of the flushed rows."""
        from boxmot_tpu.trackers.zoo import create_tracker

        frames, embss = identity_emb_scene(n_frames=60, occl=(0, 15, 35), seed=0)
        kw = dict(
            with_reid=True, max_age=8, gta_enabled=True, gta_interpolate=True,
            gta_min_track_length=3, gta_max_gap=40,
        )
        jax_trk = create_tracker(
            "occluboost", use_cmc=False, reid_model=_DummyReID(), **kw
        )
        cpp_trk = create_tracker("occluboost:cpp", **kw)
        self._compare(jax_trk, cpp_trk, frames, embss)
        # the occluded object's id must survive the >max_age gap via the
        # graveyard on BOTH backends (compare() already asserts same ids)
        rows_j = jax_trk.flush_gta()
        rows_c = cpp_trk.flush_gta()
        assert rows_j.shape == rows_c.shape
        assert rows_j.shape[0] > 0, "resurrection produced no gap rows"
        key = np.lexsort((rows_j[:, 0], rows_j[:, 1]))
        key_c = np.lexsort((rows_c[:, 0], rows_c[:, 1]))
        np.testing.assert_allclose(rows_c[key_c], rows_j[key], atol=0.5)

    def test_native_embs_without_reid_is_motion_only(self):
        """with_reid=False ignores embeddings entirely (device gate)."""
        from boxmot_tpu.trackers.zoo import create_tracker

        frames, embss = identity_emb_scene(n_frames=20, seed=1)
        a = create_tracker("occluboost:cpp", with_reid=False)
        b = create_tracker("occluboost:cpp", with_reid=False)
        for dets, embs in zip(frames, embss):
            out_a = np.asarray(a.update(dets, IMG, embs=embs))
            out_b = np.asarray(b.update(dets, IMG))
            np.testing.assert_array_equal(out_a, out_b)
