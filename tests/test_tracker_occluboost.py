"""OccluBoost: contract, recovery, confirmation, AMS, GTA behaviors."""

import numpy as np
import pytest

from boxmot_tpu.trackers.occluboost import OccluBoost

IMG = np.zeros((480, 640, 3), np.uint8)


class FakeReID:
    """Positional identity features for deterministic appearance tests."""

    feature_dim = 8

    def get_features(self, boxes, img):
        out = np.zeros((len(boxes), 8), np.float32)
        for i, b in enumerate(boxes):
            cx = (b[0] + b[2]) / 2
            rng = np.random.default_rng(int(cx // 150))
            out[i] = rng.normal(0, 1, 8)
        out /= np.linalg.norm(out, axis=1, keepdims=True) + 1e-12
        return out


def make(**kw):
    kw.setdefault("use_cmc", False)
    kw.setdefault("capacity", 64)
    kw.setdefault("det_thresh", 0.5)
    kw.setdefault("reid_model", FakeReID())
    return OccluBoost(**kw)


def emb(seed, dim=8):
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 1, dim).astype(np.float32)
    return v / np.linalg.norm(v)


def test_basic_contract():
    trk = make(min_hits=1)
    dets = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    out = trk.update(dets, IMG, embs=emb(0)[None])
    assert out.shape == (1, 8)
    assert int(out.id[0]) == 1


def test_confirmation_gate():
    """Tracks from medium-conf dets stay tentative until confirm_hits."""
    trk = make(min_hits=1, confirm_hits=2, instant_confirm_thresh=0.95,
               new_track_thresh=0.55)
    d = np.array([[100, 100, 160, 260, 0.6, 0.0]], np.float32)
    out1 = trk.update(d, IMG, embs=emb(0)[None])
    # frame 1 warmup emits only activated tracks; tentative -> nothing
    assert out1.shape[0] == 0
    out2 = trk.update(d, IMG, embs=emb(0)[None])
    assert out2.shape[0] == 0  # streak 1 < confirm_hits
    out3 = trk.update(d, IMG, embs=emb(0)[None])
    assert out3.shape[0] == 1  # streak reached confirm_hits


def test_instant_confirm():
    trk = make(min_hits=1, confirm_hits=2, instant_confirm_thresh=0.7)
    d = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    out = trk.update(d, IMG, embs=emb(0)[None])
    assert out.shape[0] == 1  # high conf skips tentative state


def test_tentative_track_expires_quickly():
    trk = make(min_hits=1, confirm_hits=3, instant_confirm_thresh=0.95,
               tentative_max_age=1, new_track_thresh=0.55)
    d = np.array([[100, 100, 160, 260, 0.6, 0.0]], np.float32)
    trk.update(d, IMG, embs=emb(0)[None])
    trk.update(np.empty((0, 6), np.float32), IMG)
    trk.update(np.empty((0, 6), np.float32), IMG)  # tentative expired
    for _ in range(4):  # streak must reach confirm_hits = 3
        out = trk.update(d, IMG, embs=emb(0)[None])
    assert int(out.id[0]) == 2  # old tentative id 1 was dropped


def test_reid_recovery_pass():
    """Lost track recovered by appearance when IoU match fails."""
    trk = make(min_hits=1, recovery_appearance_thresh=0.9,
               recovery_iou_thresh=0.01, use_dlo_boost=False, use_duo_boost=False)
    f = emb(3)
    d1 = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    for _ in range(4):
        trk.update(d1, IMG, embs=f[None])
    # sudden jump: IoU still barely overlaps (recovery gate is loose)
    d2 = np.array([[140, 130, 200, 290, 0.9, 0.0]], np.float32)
    out = trk.update(d2, IMG, embs=f[None])
    assert int(out.id[0]) == 1


def test_gta_resurrection_reuses_id():
    """A track that dies and reappears within gta_max_gap gets its old id
    back, and gap rows are interpolated."""
    trk = make(
        min_hits=1, max_age=2, gta_enabled=True, gta_min_track_length=3,
        gta_appearance_thresh=0.8, gta_max_gap=30,
        use_dlo_boost=False, use_duo_boost=False,
    )
    f = emb(7)
    d1 = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    for _ in range(6):
        out = trk.update(d1, IMG, embs=f[None])
    assert int(out.id[0]) == 1
    for _ in range(5):  # > max_age: track dies, buried in graveyard
        trk.update(np.empty((0, 6), np.float32), IMG)
    d2 = np.array([[130, 120, 190, 280, 0.9, 0.0]], np.float32)
    trk.update(d2, IMG, embs=f[None])  # resurrection frame (streak 0)
    out = trk.update(d2, IMG, embs=f[None])
    assert out.shape[0] == 1
    assert int(out.id[0]) == 1  # resurrected with the same id
    gap = trk.flush_gta()
    assert gap.shape[0] > 0  # interpolated gap rows emitted
    assert np.all(gap[:, 1] == 1)


def test_duplicate_emission_suppression():
    trk = make(min_hits=1, duplicate_iou_thresh=0.85,
               use_dlo_boost=False, use_duo_boost=False)
    d1 = np.array([[100, 100, 160, 260, 0.9, 0.0]], np.float32)
    for _ in range(5):
        trk.update(d1, IMG, embs=emb(0)[None])
    # force a second track onto nearly the same box via two dets
    d2 = np.array(
        [[100, 100, 160, 260, 0.9, 0.0], [101, 101, 161, 261, 0.9, 0.0]], np.float32
    )
    trk.update(d2, IMG, embs=np.stack([emb(0), emb(1)]))
    out = trk.update(d2, IMG, embs=np.stack([emb(0), emb(1)]))
    # duplicate suppression keeps at most one track on the object
    assert out.shape[0] <= 2


def test_ams_dampens_abnormal_shrink():
    """A sudden box shrink (partial occlusion) moves the state less with
    AMS enabled than with it disabled."""
    def run(ams):
        trk = make(min_hits=1, ams_enabled=ams, ams_threshold=0.1,
                   ams_alpha0=0.2, use_dlo_boost=False, use_duo_boost=False)
        f = emb(0)
        for i in range(8):
            d = np.array([[100 + i, 100, 160 + i, 260, 0.9, 0.0]], np.float32)
            trk.update(d, IMG, embs=f[None])
        shrunk = np.array([[108, 100, 138, 180, 0.9, 0.0]], np.float32)
        out = trk.update(shrunk, IMG, embs=f[None])
        return np.asarray(out)[0, 3]  # y2 after update

    y2_ams = run(True)
    y2_no = run(False)
    # with AMS, state trusts the abnormal (shrunk) observation less
    assert y2_ams > y2_no
