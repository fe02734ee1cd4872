"""StrongSort: contract + cascade behaviors."""

import numpy as np

from boxmot_tpu.trackers.strongsort import StrongSort

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
    trk = StrongSort(**kw)
    trk.cmc = None  # deterministic tests
    return trk


def test_tentative_until_n_init():
    trk = make(n_init=3)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    out1 = trk.update(d, IMG)
    assert out1.shape[0] == 0  # tentative
    out2 = trk.update(d, IMG)
    assert out2.shape[0] == 0
    out3 = trk.update(d, IMG)  # hits reaches n_init -> confirmed
    assert out3.shape[0] == 1
    assert int(out3.id[0]) == 1


def test_tentative_miss_deletes():
    trk = make(n_init=3)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(np.empty((0, 6), np.float32), IMG)  # tentative missed -> deleted
    for _ in range(3):
        out = trk.update(d, IMG)
    assert int(out.id[0]) == 2  # new identity


def test_confirmed_survives_misses():
    trk = make(n_init=1, max_age=10)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    trk.update(d, IMG)
    trk.update(d, IMG)  # first update confirms (hits >= n_init)
    for _ in range(3):
        trk.update(np.empty((0, 6), np.float32), IMG)
    out = trk.update(d, IMG)
    # recovered via appearance cascade (bank) with the same id
    assert out.shape[0] == 1 and int(out.id[0]) == 1


def test_appearance_cascade_after_gap():
    """Confirmed track missed >1 frame can only match via appearance
    (IoU pass excludes tsu > 1) — feature bank must carry identity."""
    trk = make(n_init=1, max_age=20, max_cos_dist=0.4)
    d1 = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    for _ in range(4):
        trk.update(d1, IMG)
    trk.update(np.empty((0, 6), np.float32), IMG)
    trk.update(np.empty((0, 6), np.float32), IMG)
    # same appearance bucket, still overlapping position
    d2 = np.array([[110, 105, 170, 265, 0.9, 0.0]], np.float32)
    out = trk.update(d2, IMG)
    assert out.shape[0] == 1 and int(out.id[0]) == 1


def test_min_conf_filter():
    trk = make(min_conf=0.5)
    d = np.array([[100, 100, 160, 260, 0.3, 0.0]], np.float32)
    for _ in range(4):
        out = trk.update(d, IMG)
    assert out.shape[0] == 0
