"""BoostTrack: contract + boosting behaviors."""

import numpy as np
import pytest

from boxmot_tpu.trackers.boosttrack import BoostTrack

IMG = np.zeros((480, 640, 3), np.uint8)


def make(**kw):
    kw.setdefault("use_cmc", False)
    kw.setdefault("capacity", 64)
    kw.setdefault("det_thresh", 0.5)
    return BoostTrack(**kw)


def test_basic_contract():
    trk = make(min_hits=1)
    dets = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    out = trk.update(dets, IMG)
    assert out.shape == (1, 8)
    assert int(out.id[0]) == 1


def test_output_is_kf_state_box():
    # BoostTrack outputs the filter state, not the raw detection.
    trk = make(min_hits=1)
    d1 = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    out1 = trk.update(d1, IMG)
    np.testing.assert_allclose(np.asarray(out1)[0, :4], d1[0, :4], atol=0.5)
    d2 = np.array([[110, 100, 170, 260, 0.9, 0.0]], np.float32)
    out2 = trk.update(d2, IMG)
    # KF smoothing: box between previous state and measurement
    x1 = np.asarray(out2)[0, 0]
    assert 100.0 < x1 < 110.0


def test_aspect_ratio_filter():
    trk = make(min_hits=1, aspect_ratio_thresh=1.6)
    wide = np.array([[100, 100, 400, 160, 0.9, 0.0]], np.float32)  # w/h = 5
    out = trk.update(wide, IMG)
    assert out.shape[0] == 0


def test_min_box_area_filter():
    trk = make(min_hits=1, min_box_area=100)
    tiny = np.array([[100, 100, 105, 110, 0.9, 0.0]], np.float32)  # area 50
    out = trk.update(tiny, IMG)
    assert out.shape[0] == 0


def test_dlo_boost_rescues_faded_detection():
    """DLO: a low-conf det overlapping an existing track gets boosted."""
    trk = make(min_hits=1, use_duo_boost=False, det_thresh=0.5)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(d, IMG)
    faded = np.array([[101, 101, 161, 261, 0.2, 0.0]], np.float32)
    out = trk.update(faded, IMG)
    # iou ~1 -> boosted conf ~0.65 >= 0.5 -> still tracked with same id
    assert out.shape[0] == 1 and int(out.id[0]) == 1


def test_no_dlo_boost_drops_faded_detection():
    trk = make(min_hits=1, use_dlo_boost=False, use_duo_boost=False, det_thresh=0.5)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(d, IMG)
    faded = np.array([[101, 101, 161, 261, 0.2, 0.0]], np.float32)
    out = trk.update(faded, IMG)
    assert out.shape[0] == 0


def test_duo_boost_new_unexplained_detection():
    """DUO: a low-conf det far (in Mahalanobis) from all tracks gets
    lifted to det_thresh and starts a track."""
    trk = make(min_hits=1, use_dlo_boost=False, det_thresh=0.5)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    # converge the track covariance so the chi2 gate becomes meaningful
    for _ in range(6):
        trk.update(d, IMG)
    both = np.array(
        [[100, 100, 160, 260, 0.9, 0.0], [400, 300, 460, 460, 0.3, 0.0]], np.float32
    )
    trk.update(both, IMG)  # far det boosted by DUO, track created (streak 0)
    assert np.asarray(trk._state.active).sum() == 2
    # detector recovers: both high conf -> both tracks emitted
    both_high = both.copy()
    both_high[1, 4] = 0.9
    out = trk.update(both_high, IMG)
    assert out.shape[0] == 2

    # without DUO boost the same faded det never starts a track
    trk2 = make(min_hits=1, use_dlo_boost=False, use_duo_boost=False, det_thresh=0.5)
    for _ in range(6):
        trk2.update(d, IMG)
    trk2.update(both, IMG)
    assert np.asarray(trk2._state.active).sum() == 1


def test_min_hits_warmup():
    trk = make(min_hits=2)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(d, IMG)
    d2 = np.vstack([d, [[300, 300, 360, 460, 0.9, 0.0]]]).astype(np.float32)
    out3 = trk.update(d2, IMG)  # new track, streak 0, frame 3 > min_hits
    assert out3.shape[0] == 1
    out4 = trk.update(d2, IMG)
    assert out4.shape[0] == 1  # streak 1
    out5 = trk.update(d2, IMG)
    assert out5.shape[0] == 2  # streak 2
