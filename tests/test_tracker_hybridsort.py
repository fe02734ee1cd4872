"""HybridSort: contract + score-aware behaviors."""

import numpy as np

from boxmot_tpu.trackers.hybridsort import HybridSort

IMG = np.zeros((480, 640, 3), np.uint8)


class FakeReID:
    feature_dim = 8

    def get_features(self, boxes, img):
        out = np.zeros((len(boxes), 8), np.float32)
        for i, b in enumerate(boxes):
            rng = np.random.default_rng(int((b[0] + b[2]) // 260))
            out[i] = rng.normal(0, 1, 8)
        out /= np.linalg.norm(out, axis=1, keepdims=True) + 1e-12
        return out


def make(**kw):
    kw.setdefault("reid_model", FakeReID())
    kw.setdefault("capacity", 64)
    kw.setdefault("det_thresh", 0.5)
    trk = HybridSort(**kw)
    trk.cmc = None
    return trk


def test_basic_contract_and_warmup():
    trk = make(min_hits=3)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    out = trk.update(d, IMG)
    assert out.shape == (1, 8)  # frame 1 <= min_hits warmup
    assert int(out.id[0]) == 1  # ids emitted +1


def test_identity_stable():
    trk = make(min_hits=1)
    ids = []
    for f in range(12):
        d = np.array([[100 + 5 * f, 100, 160 + 5 * f, 260, 0.9, 0.0]], np.float32)
        out = trk.update(d, IMG)
        ids.append(out.id.astype(int).tolist())
    assert all(i == [1] for i in ids)


def test_outputs_observation_box():
    trk = make(min_hits=1)
    d = np.array([[100.25, 100.5, 160.75, 260.25, 0.9, 0.0]], np.float32)
    out = trk.update(d, IMG)
    np.testing.assert_allclose(np.asarray(out)[0, :4], d[0, :4], atol=1e-3)


def test_byte_pass_keeps_track():
    trk = make(min_hits=1, use_byte=True)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    for _ in range(4):
        trk.update(d, IMG)
    low = np.array([[102, 102, 162, 262, 0.3, 0.0]], np.float32)
    out = trk.update(low, IMG)
    assert out.shape[0] == 1 and int(out.id[0]) == 1


def test_without_reid():
    trk = make(reid_model=None, with_reid=False, min_hits=1)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    for _ in range(3):
        out = trk.update(d, IMG)
    assert int(out.id[0]) == 1


def test_occlusion_recovery():
    trk = make(min_hits=1, max_age=10)
    frames = []
    ids = []
    for f in range(16):
        rows = []
        if not (6 <= f < 9):
            rows = [[100 + 5 * f, 100, 160 + 5 * f, 260, 0.9, 0.0]]
        out = trk.update(np.array(rows, np.float32).reshape(-1, 6), IMG)
        ids.append(out.id.astype(int).tolist())
    assert ids[5] == [1] and ids[10] == [1]
