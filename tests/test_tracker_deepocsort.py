"""DeepOcSort: contract + appearance/CMC behaviors."""

import numpy as np
import pytest

from boxmot_tpu.trackers.deepocsort import DeepOcSort

IMG = np.zeros((480, 640, 3), np.uint8)


def make(**kw):
    kw.setdefault("cmc_off", True)
    kw.setdefault("capacity", 64)
    trk = DeepOcSort(**kw)
    trk.cfg = trk.cfg.__class__(**{**trk.cfg.__dict__, "feat_dim": 8})
    return trk


def emb(vec):
    v = np.zeros(8, np.float32)
    v[vec] = 1.0
    return v


def test_basic_contract():
    trk = make()
    dets = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
    out = trk.update(dets, IMG, embs=emb(0)[None])
    assert out.shape == (1, 8)
    assert int(out.id[0]) == 1


def test_identity_stable_with_embeddings():
    trk = make(min_hits=1)
    ids = []
    for f in range(12):
        d = np.array([[10 + 5 * f, 10, 60 + 5 * f, 100, 0.9, 0.0]], np.float32)
        out = trk.update(d, IMG, embs=emb(0)[None])
        ids.append(out.id.astype(int).tolist())
    assert all(i == [1] for i in ids)


def test_occlusion_recovery_oru():
    trk = make(min_hits=1)
    ids = []
    for f in range(20):
        rows, es = [], []
        if not (8 <= f < 12):
            rows = [[100 + 6 * f, 100, 160 + 6 * f, 220, 0.9, 0.0]]
            es = [emb(1)]
        out = trk.update(
            np.array(rows, np.float32).reshape(-1, 6),
            IMG,
            embs=np.array(es, np.float32).reshape(-1, 8),
        )
        ids.append(out.id.astype(int).tolist())
    assert ids[7] == [1] and ids[13] == [1]


def test_embedding_breaks_iou_tie():
    """Two crossing same-size objects with distinct embeddings keep ids."""
    trk = make(min_hits=1, w_association_emb=0.75, aw_off=True)
    for f in range(14):
        xa = 50 + 10 * f
        xb = 180 - 10 * f
        dets = np.array(
            [[xa, 100, xa + 60, 220, 0.9, 0.0], [xb, 100, xb + 60, 220, 0.9, 0.0]],
            np.float32,
        )
        es = np.stack([emb(2), emb(3)])
        out = trk.update(dets, IMG, embs=es)
        d = {int(r[7]): int(r[4]) for r in np.asarray(out)}  # det_ind -> id
    # after full crossing, det 0 (A, emb 2) should still be id 1
    assert d[0] == 1 and d[1] == 2


def test_embedding_off_matches_ocsort_like():
    trk = make(embedding_off=True, min_hits=1)
    d = np.array([[10, 10, 60, 100, 0.9, 0.0]], np.float32)
    for _ in range(3):
        out = trk.update(d, IMG)
    assert int(out.id[0]) == 1
