"""OBB tracking path: ByteTrack and SFSORT on oriented boxes."""

import numpy as np
import pytest

from boxmot_tpu.trackers.bytetrack import ByteTrack
from boxmot_tpu.trackers.sfsort import SFSORT

IMG = np.zeros((480, 640, 3), np.uint8)


def obb_det(cx, cy, w=60, h=24, angle=0.4, conf=0.9):
    return [cx, cy, w, h, angle, conf, 0.0]


def test_obb_contract_and_layout_inference():
    trk = ByteTrack()
    dets = np.array([obb_det(100, 100)], np.float32)  # 7 cols -> OBB inferred
    out = trk.update(dets, IMG)
    assert out.shape == (1, 9)
    assert out.is_obb
    assert int(out.id[0]) == 1
    np.testing.assert_allclose(out.xywha[0, :4], dets[0, :4], atol=1.0)


def test_obb_identity_under_motion_and_rotation():
    trk = ByteTrack()
    ids = []
    for f in range(12):
        d = np.array([obb_det(100 + 6 * f, 100 + 2 * f, angle=0.4 + 0.02 * f)], np.float32)
        out = trk.update(d, IMG)
        ids.append(sorted(out.id.astype(int).tolist()))
    assert all(i == [1] for i in ids)


def test_obb_angle_flip_parameterization():
    """Swapped w/h + 90-degree angle is the same rectangle; identity and
    state continuity must survive the flip."""
    trk = ByteTrack()
    d1 = np.array([obb_det(100, 100, w=60, h=24, angle=0.2)], np.float32)
    for _ in range(3):
        out = trk.update(d1, IMG)
    flipped = np.array([obb_det(100, 100, w=24, h=60, angle=0.2 + np.pi / 2)], np.float32)
    out = trk.update(flipped, IMG)
    assert int(out.id[0]) == 1
    # state stays in the original parameterization (w > h)
    assert out.xywha[0, 2] > out.xywha[0, 3]


def test_obb_two_objects_crossing():
    trk = ByteTrack()
    for f in range(10):
        dets = np.array(
            [
                obb_det(80 + 10 * f, 100, angle=0.3),
                obb_det(280 - 10 * f, 110, angle=-0.5),
            ],
            np.float32,
        )
        out = trk.update(dets, IMG)
    assert sorted(out.id.astype(int).tolist()) == [1, 2]


def test_obb_low_conf_second_stage():
    trk = ByteTrack()
    d = np.array([obb_det(100, 100, conf=0.9)], np.float32)
    trk.update(d, IMG)
    low = np.array([obb_det(104, 101, conf=0.3)], np.float32)
    out = trk.update(low, IMG)
    assert out.shape[0] == 1 and int(out.id[0]) == 1


class TestSFSortOBB:
    def test_contract(self):
        trk = SFSORT()
        out = trk.update(np.array([obb_det(100, 100)], np.float32), IMG)
        assert out.shape == (1, 9)
        assert out.is_obb
        assert int(out.id[0]) == 0  # SFSORT ids start at 0
        np.testing.assert_allclose(out.xywha[0], [100, 100, 60, 24, 0.4], atol=1e-4)

    def test_identity_under_motion_and_rotation(self):
        trk = SFSORT()
        for f in range(12):
            d = np.array(
                [obb_det(100 + 6 * f, 100 + 2 * f, angle=0.4 + 0.02 * f)], np.float32
            )
            out = trk.update(d, IMG)
            assert out.id.astype(int).tolist() == [0]

    def test_angle_flip_keeps_parameterization(self):
        trk = SFSORT()
        for _ in range(3):
            trk.update(np.array([obb_det(100, 100, w=60, h=24, angle=0.2)], np.float32), IMG)
        flipped = np.array(
            [obb_det(100, 100, w=24, h=60, angle=0.2 + np.pi / 2)], np.float32
        )
        out = trk.update(flipped, IMG)
        assert int(out.id[0]) == 0
        assert out.xywha[0, 2] > out.xywha[0, 3]
        np.testing.assert_allclose(out.xywha[0, 4], 0.2, atol=1e-4)

    def test_theta_velocity_damping(self):
        # A sudden 0.3 rad jump moves the state angle by (1 - damping) * 0.3.
        trk = SFSORT(obb_theta_damping=0.8)
        for _ in range(5):
            trk.update(np.array([obb_det(100, 100, angle=0.2)], np.float32), IMG)
        out = trk.update(np.array([obb_det(100, 100, angle=0.5)], np.float32), IMG)
        np.testing.assert_allclose(out.xywha[0, 4], 0.2 + 0.2 * 0.3, atol=1e-4)

    def test_second_pass_rotated_iou(self):
        trk = SFSORT()
        for _ in range(2):
            trk.update(
                np.array([obb_det(100, 100), obb_det(300, 200, angle=-0.3)], np.float32),
                IMG,
            )
        mixed = np.array(
            [obb_det(100, 100), obb_det(302, 201, angle=-0.3, conf=0.3)], np.float32
        )
        out = trk.update(mixed, IMG)
        assert sorted(out.id.astype(int).tolist()) == [0, 1]


class TestOcSortOBB:
    def test_contract_and_raw_observation_output(self):
        from boxmot_tpu.trackers.ocsort import OcSort

        trk = OcSort(min_hits=1)
        out = trk.update(np.array([obb_det(100, 100)], np.float32), IMG)
        assert out.shape == (1, 9)
        assert out.is_obb
        assert int(out.id[0]) == 1
        # OC-SORT emits the raw last observation, not the KF state
        np.testing.assert_allclose(out.xywha[0], [100, 100, 60, 24, 0.4], atol=1e-4)

    def test_identity_under_motion_and_rotation(self):
        from boxmot_tpu.trackers.ocsort import OcSort

        trk = OcSort(min_hits=1)
        for f in range(12):
            d = np.array(
                [obb_det(100 + 6 * f, 100 + 2 * f, angle=0.4 + 0.02 * f)], np.float32
            )
            out = trk.update(d, IMG)
            assert out.id.astype(int).tolist() == [1]

    def test_oru_rejoin_after_misses(self):
        from boxmot_tpu.trackers.ocsort import OcSort

        trk = OcSort(min_hits=1, max_age=10)
        for f in range(8):
            d = np.array(
                [obb_det(100 + 6 * f, 100 + 2 * f, angle=0.3 + 0.02 * f)], np.float32
            )
            trk.update(d, IMG)
        for _ in range(3):
            trk.update(np.empty((0, 7), np.float32), IMG)
        f = 11
        out = trk.update(
            np.array([obb_det(100 + 6 * f, 100 + 2 * f, angle=0.3 + 0.02 * f)], np.float32),
            IMG,
        )
        assert out.shape[0] == 1 and int(out.id[0]) == 1
        assert np.isfinite(np.asarray(out)).all()

    def test_angle_flip_keeps_identity(self):
        from boxmot_tpu.trackers.ocsort import OcSort

        trk = OcSort(min_hits=1)
        for _ in range(3):
            trk.update(np.array([obb_det(100, 100, angle=0.2)], np.float32), IMG)
        flipped = np.array(
            [obb_det(100, 100, w=24, h=60, angle=0.2 + np.pi / 2)], np.float32
        )
        out = trk.update(flipped, IMG)
        assert int(out.id[0]) == 1
        # the raw observation is emitted verbatim (flipped parameterization)
        np.testing.assert_allclose(out.xywha[0, 2:], [24, 60, 0.2 + np.pi / 2], atol=1e-4)

    def test_two_objects_crossing(self):
        from boxmot_tpu.trackers.ocsort import OcSort

        trk = OcSort(min_hits=1)
        for f in range(10):
            dets = np.array(
                [
                    obb_det(80 + 10 * f, 100, angle=0.3),
                    obb_det(280 - 10 * f, 110, angle=-0.5),
                ],
                np.float32,
            )
            out = trk.update(dets, IMG)
        assert sorted(out.id.astype(int).tolist()) == [1, 2]


class TestBotSortOBB:
    def test_contract_and_identity(self):
        from boxmot_tpu.trackers.botsort import BotSort

        trk = BotSort(with_reid=False, use_cmc=False)
        for f in range(10):
            d = np.array(
                [obb_det(100 + 4 * f, 100 + 2 * f, angle=0.4 + 0.02 * f)], np.float32
            )
            out = trk.update(d, IMG)
        assert out.shape == (1, 9)
        assert out.is_obb
        assert int(out.id[0]) == 1
        # KF state output tracks the detection stream
        np.testing.assert_allclose(out.xywha[0, :2], [136, 118], atol=3.0)
        # theta-velocity damping (x0.8 per update) makes the state angle lag
        # the detection ramp (dets end at 0.58)
        assert 0.40 < float(out.xywha[0, 4]) < 0.62

    def test_two_objects_and_second_stage(self):
        from boxmot_tpu.trackers.botsort import BotSort

        trk = BotSort(with_reid=False, use_cmc=False)
        for f in range(6):
            dets = np.array(
                [obb_det(80 + 6 * f, 100, angle=0.3), obb_det(250 - 6 * f, 110, angle=-0.5)],
                np.float32,
            )
            out = trk.update(dets, IMG)
        # drop one det to low conf -> second pass keeps it alive
        mixed = np.array(
            [obb_det(80 + 36, 100, angle=0.3), obb_det(250 - 36, 110, angle=-0.5, conf=0.3)],
            np.float32,
        )
        out = trk.update(mixed, IMG)
        assert sorted(out.id.astype(int).tolist()) == [1, 2]

    def test_identity_warp_cmc_noop(self):
        from boxmot_tpu.trackers.botsort import BotSort

        # ECC on a static random frame estimates ~identity; OBB CMC path
        # (corner warp + refit) must not perturb the track.
        trk = BotSort(with_reid=False, use_cmc=True, cmc_method="ecc")
        for _ in range(4):
            out = trk.update(np.array([obb_det(100, 100, angle=0.2)], np.float32), IMG)
        assert int(out.id[0]) == 1
        np.testing.assert_allclose(out.xywha[0], [100, 100, 60, 24, 0.2], atol=1.0)


class TestOccluBoostOBB:
    def test_contract_and_identity(self):
        from boxmot_tpu.trackers.occluboost import OccluBoost

        trk = OccluBoost(with_reid=False, use_cmc=False, min_hits=1, confirm_hits=1)
        for f in range(10):
            d = np.array(
                [obb_det(100 + 4 * f, 100 + 2 * f, angle=0.4 + 0.02 * f)], np.float32
            )
            out = trk.update(d, IMG)
        assert out.shape == (1, 9)
        assert out.is_obb
        assert int(out.id[0]) == 1
        assert np.isfinite(np.asarray(out)).all()

    def test_two_objects(self):
        from boxmot_tpu.trackers.occluboost import OccluBoost

        trk = OccluBoost(with_reid=False, use_cmc=False, min_hits=1, confirm_hits=1)
        for f in range(8):
            dets = np.array(
                [obb_det(80 + 6 * f, 100, angle=0.3), obb_det(250 - 6 * f, 110, angle=-0.5)],
                np.float32,
            )
            out = trk.update(dets, IMG)
        assert sorted(out.id.astype(int).tolist()) == [1, 2]


def test_obb_scan_replay():
    """Whole-sequence lax.scan replay works in OBB mode (8-col packing)."""
    from boxmot_tpu.engine.replay import init_state, pack_frames, scan_replay
    from boxmot_tpu.trackers.bytetrack import ByteTrackConfig
    import jax.numpy as jnp

    cfg = ByteTrackConfig(capacity=32, is_obb=True)
    frames = [
        np.array([[100 + 5 * f, 100 + 2 * f, 60, 24, 0.4 + 0.02 * f, 0.9, 0]], np.float32)
        for f in range(12)
    ]
    packed, n_frames = pack_frames(frames, det_cols=7)
    state = init_state(cfg)
    _, outs, masks = scan_replay(cfg, state, jnp.asarray(packed))
    outs, masks = np.asarray(outs), np.asarray(masks)
    assert outs.shape[-1] == 9
    ids = {int(i) for f in range(n_frames) for i in outs[f][masks[f]][:, 5]}
    assert ids == {1}
    # last emitted box tracks the stream
    last = outs[n_frames - 1][masks[n_frames - 1]][0]
    np.testing.assert_allclose(last[:2], [155, 122], atol=3.0)


def test_obb_rejected_by_non_obb_tracker():
    from boxmot_tpu.trackers.strongsort import StrongSort

    trk = StrongSort()
    with pytest.raises(AssertionError):
        trk.update(np.array([obb_det(10, 10)], np.float32), IMG)
