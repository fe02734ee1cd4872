"""SFSORT SoA step: contract and behavior tests."""

import numpy as np

from boxmot_tpu.trackers.sfsort import SFSORT

IMG = np.zeros((480, 640, 3), np.uint8)


def test_basic_tracking_and_ids_start_at_zero():
    trk = SFSORT()
    dets = np.array(
        [[10, 10, 60, 100, 0.95, 0.0], [300, 50, 360, 170, 0.9, 0.0]], np.float32
    )
    out = trk.update(dets, IMG)
    assert out.shape == (2, 8)
    assert sorted(out.id.astype(int)) == [0, 1]  # reference ids start at 0


def test_box_is_last_detection():
    # SFSORT has no motion model: output box == the matched detection box.
    trk = SFSORT()
    d1 = np.array([[10.5, 10.25, 60.5, 100.75, 0.95, 0.0]], np.float32)
    out = trk.update(d1, IMG)
    np.testing.assert_allclose(np.asarray(out)[0, :4], d1[0, :4], atol=1e-4)


def test_identity_maintained_when_moving():
    trk = SFSORT()
    ids = []
    for f in range(10):
        d = np.array([[10 + 4 * f, 10, 60 + 4 * f, 100, 0.95, 0.0]], np.float32)
        out = trk.update(d, IMG)
        ids.append(out.id.astype(int).tolist())
    assert all(i == [0] for i in ids)


def test_new_track_th_gate():
    trk = SFSORT(high_th=0.6, new_track_th=0.8)
    dets = np.array([[10, 10, 60, 100, 0.7, 0.0]], np.float32)
    out = trk.update(dets, IMG)
    assert out.shape[0] == 0  # high-conf but below new_track_th


def test_second_pass_keeps_track_alive():
    trk = SFSORT(central_timeout=10, marginal_timeout=10)
    d_high = np.array([[100, 100, 160, 220, 0.95, 0.0]], np.float32)
    trk.update(d_high, IMG)
    # next frame: same object at low confidence + another high det elsewhere
    dets = np.array(
        [[400, 300, 440, 400, 0.95, 0.0], [102, 102, 162, 222, 0.3, 0.0]], np.float32
    )
    out = trk.update(dets, IMG)
    assert 0 in out.id.astype(int)


def test_only_low_conf_dets_drop_tracks():
    """Reference quirk: a frame with only intermediate dets drops all
    unmatched tracks entirely (sfsort.py:352-361)."""
    trk = SFSORT(central_timeout=50, marginal_timeout=50)
    d = np.array([[100, 100, 160, 220, 0.95, 0.0]], np.float32)
    trk.update(d, IMG)
    low = np.array([[100, 100, 160, 220, 0.3, 0.0]], np.float32)
    trk.update(low, IMG)  # drops track 0
    out = trk.update(d, IMG)
    assert out.id.astype(int).tolist() == [1]  # new id


def test_lost_track_refound_with_timeout():
    trk = SFSORT(central_timeout=20, marginal_timeout=20)
    d = np.array([[300, 200, 360, 320, 0.95, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(np.empty((0, 6), np.float32), IMG)  # all pool -> lost
    trk.update(np.empty((0, 6), np.float32), IMG)
    out = trk.update(d, IMG)
    assert out.id.astype(int).tolist() == [0]


def test_lost_track_purged_with_zero_timeout():
    trk = SFSORT()  # timeouts default 0 -> lost purged next frame
    d = np.array([[300, 200, 360, 320, 0.95, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(np.empty((0, 6), np.float32), IMG)
    trk.update(np.empty((0, 6), np.float32), IMG)
    out = trk.update(d, IMG)
    assert out.id.astype(int).tolist() == [1]
