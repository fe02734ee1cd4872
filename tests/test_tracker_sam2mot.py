"""Sam2Mot: hybrid bbox+mask tracker behaviors."""

import numpy as np

from boxmot_tpu.trackers.sam2mot import Sam2Mot

IMG = np.zeros((120, 160, 3), np.uint8)


def box_mask(b, hw=(120, 160)):
    m = np.zeros(hw, np.uint8)
    m[int(b[1]):int(b[3]), int(b[0]):int(b[2])] = 1
    return m


def test_basic_masks_roundtrip():
    trk = Sam2Mot()
    dets = np.array([[10, 10, 40, 60, 0.9, 0.0]], np.float32)
    masks = np.stack([box_mask(dets[0])])
    out = trk.update(dets, IMG, masks=masks)
    assert out.shape == (1, 8)
    assert int(out.id[0]) == 1
    assert out.masks is not None and out.masks.shape == (1, 120, 160)


def test_identity_with_motion():
    trk = Sam2Mot()
    for f in range(8):
        d = np.array([[10 + 3 * f, 10, 40 + 3 * f, 60, 0.9, 0.0]], np.float32)
        out = trk.update(d, IMG, masks=np.stack([box_mask(d[0])]))
    assert int(out.id[0]) == 1


def test_works_without_masks():
    trk = Sam2Mot()
    d = np.array([[10, 10, 40, 60, 0.9, 0.0]], np.float32)
    out = trk.update(d, IMG)
    assert out.shape[0] == 1
    assert out.masks is None


def test_untracked_gate_blocks_duplicate_spawn():
    """A second detection fully inside an existing track's mask must not
    spawn a new identity."""
    trk = Sam2Mot()
    d = np.array([[10, 10, 60, 80, 0.9, 0.0]], np.float32)
    m = np.stack([box_mask(d[0])])
    trk.update(d, IMG, masks=m)
    dets2 = np.array(
        [[10, 10, 60, 80, 0.9, 0.0], [20, 20, 50, 70, 0.85, 0.0]], np.float32
    )
    masks2 = np.stack([box_mask(dets2[0]), box_mask(dets2[1])])
    out = trk.update(dets2, IMG, masks=masks2)
    assert set(out.id.astype(int)) == {1}


def test_low_conf_states_and_loss():
    trk = Sam2Mot(tau_s=0.3, tolerance_frames=2)
    d = np.array([[10, 10, 40, 60, 0.9, 0.0]], np.float32)
    trk.update(d, IMG, masks=np.stack([box_mask(d[0])]))
    for _ in range(4):
        out = trk.update(np.empty((0, 6), np.float32), IMG)
    assert out.shape[0] == 0
    # track purged; reappearance gets a fresh id
    out = trk.update(d, IMG, masks=np.stack([box_mask(d[0])]))
    assert int(out.id[0]) == 2


def test_coi_occlusion_drops_mask_memory():
    trk = Sam2Mot(miou_threshold=0.7)
    a = np.array([10, 10, 60, 80], np.float32)
    for f in range(6):
        dets = np.array(
            [[*a, 0.9, 0.0], [*(a + [2, 2, 2, 2]), 0.5, 0.0]], np.float32
        )
        masks = np.stack([box_mask(dets[0]), box_mask(dets[1])])
        out = trk.update(dets, IMG, masks=masks)
    # tracker survives full-overlap scenes without crashing or exploding ids
    assert len(set(out.id.astype(int))) <= 2


def test_create_via_zoo():
    import boxmot_tpu

    trk = boxmot_tpu.create_tracker("sam2mot")
    d = np.array([[10, 10, 40, 60, 0.9, 0.0]], np.float32)
    out = trk.update(d, IMG)
    assert out.shape[0] == 1
