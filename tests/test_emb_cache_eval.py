"""Cached-embedding replay equality across backends.

VERDICT r2 missing #2 acceptance: with an embedding cache present, the
appearance trackers' `name:cpp` eval rows must match the device rows —
the native backend consumes the same cached embeddings through
bmt_tracker_update_embs instead of silently downgrading to motion-only
(reference cpp replay from det+emb caches:
boxmot/native/cpp/trackers/base/src/io.cpp, engine/eval/replay.py:533).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.data.cache import (
    AppendableNpyWriter,
    det_cache_path,
    emb_cache_path,
)
from boxmot_tpu.data.mot import MOTDataset
from boxmot_tpu.engine.eval import run_eval

ASSETS = Path(__file__).resolve().parent.parent / "assets"
SYNTH_LONG = ASSETS / "synth-long" / "train"

DIM = 128
DETECTOR = "fixturedet"
REID = "identity_reid"


def _iou_matrix(a, b):
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


@pytest.fixture(scope="module")
def cache_root(tmp_path_factory):
    """det + identity-embedding caches for synth-long (its occlusion gaps make appearance matter): each det row gets
    the unit vector of its max-IoU GT identity (plus small deterministic
    noise), so appearance association has real signal."""
    root = tmp_path_factory.mktemp("embcache")
    rng = np.random.default_rng(7)
    bases: dict[int, np.ndarray] = {}

    def base(gid: int) -> np.ndarray:
        if gid not in bases:
            b = np.random.default_rng(1000 + gid).normal(size=DIM)
            bases[gid] = b / np.linalg.norm(b)
        return bases[gid]

    for seq in MOTDataset(SYNTH_LONG):
        gt = seq.gt()  # (N, >=6) [frame, id, x, y, w, h, ...]
        dp = det_cache_path(root, DETECTOR, seq.name)
        ep = emb_cache_path(root, DETECTOR, REID, seq.name)
        dp.parent.mkdir(parents=True, exist_ok=True)
        ep.parent.mkdir(parents=True, exist_ok=True)
        dets_pf = seq.dets_per_frame()
        with AppendableNpyWriter(dp, 7) as dw, AppendableNpyWriter(ep, 1 + DIM) as ew:
            for f, dets in enumerate(dets_pf, start=1):
                if not len(dets):
                    continue
                g = gt[gt[:, 0] == f]
                gboxes = np.stack(
                    [g[:, 2], g[:, 3], g[:, 2] + g[:, 4], g[:, 3] + g[:, 5]], axis=1
                ) if len(g) else np.zeros((0, 4))
                rows = np.concatenate(
                    [np.full((len(dets), 1), f, np.float32), dets[:, :6]], axis=1
                )
                dw.append(rows.astype(np.float32))
                embs = np.zeros((len(dets), DIM), np.float32)
                if len(g):
                    iou = _iou_matrix(dets[:, :4].astype(np.float64), gboxes)
                    gi = iou.argmax(axis=1)
                    for r in range(len(dets)):
                        if iou[r, gi[r]] >= 0.3:
                            e = base(int(g[gi[r], 1])) + 0.02 * rng.normal(size=DIM)
                        else:
                            e = rng.normal(size=DIM)  # clutter: unique direction
                        embs[r] = (e / np.linalg.norm(e)).astype(np.float32)
                else:
                    for r in range(len(dets)):
                        e = rng.normal(size=DIM)
                        embs[r] = (e / np.linalg.norm(e)).astype(np.float32)
                ew.append(
                    np.concatenate(
                        [np.full((len(dets), 1), f, np.float32), embs], axis=1
                    )
                )
    return root


def _run(tracker: str, cache_root: Path, out: Path, **params) -> dict:
    res = run_eval(
        SYNTH_LONG,
        tracker,
        cache_root=cache_root,
        detector=DETECTOR,
        reid=REID,
        output_dir=out,
        tracker_params=params or None,
    )
    return {k: float(res["combined"][k]) for k in ("HOTA", "MOTA", "IDF1")}


# occluboost's default-config appearance terms don't flip any assignment
# on this fixture (pass-1 fusion is rank-stable and recovery is gated at
# 0.99); online GTA is where its appearance path visibly matters, and it
# exercises the graveyard/resurrection machinery on both backends.
EXTRA = {
    "botsort": {},
    "occluboost": {"gta_enabled": True, "max_age": 10, "gta_min_track_length": 3},
}


@pytest.mark.parametrize("tracker", ["botsort", "occluboost"])
def test_emb_cache_cpp_matches_device(tracker, cache_root, tmp_path):
    extra = EXTRA[tracker]
    dev = _run(tracker, cache_root, tmp_path / "dev", feat_dim=DIM, **extra)
    cpp = _run(f"{tracker}:cpp", cache_root, tmp_path / "cpp", **extra)
    for k in dev:
        assert abs(dev[k] - cpp[k]) <= 1e-4, (tracker, k, dev, cpp)
    # appearance must actually be on: motion-only rows differ
    motion = _run(
        tracker, cache_root, tmp_path / "motion", feat_dim=DIM,
        with_reid=False, **extra,
    )
    assert any(abs(dev[k] - motion[k]) > 1e-6 for k in dev), (dev, motion)
