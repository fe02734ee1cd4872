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


def test_obb_rejected_by_non_obb_tracker():
    from boxmot_tpu.trackers.strongsort import StrongSort

    trk = StrongSort()
    with pytest.raises(AssertionError):
        trk.update(np.array([obb_det(10, 10)], np.float32), IMG)
