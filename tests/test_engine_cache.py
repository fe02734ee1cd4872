"""Cache layer: appendable npy writer resume semantics + generate workflow."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.data.cache import (
    AppendableNpyWriter,
    det_cache_path,
    load_cached_dets_per_frame,
)
from boxmot_tpu.engine.generate import run_generate

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"


def test_appendable_writer_roundtrip(tmp_path):
    path = tmp_path / "x.npy"
    with AppendableNpyWriter(path, 3) as w:
        w.append(np.arange(6).reshape(2, 3))
        w.append(np.arange(6, 12).reshape(2, 3))
    data = np.load(path)
    assert data.shape == (4, 3)
    np.testing.assert_allclose(data.ravel(), np.arange(12))


def test_appendable_writer_resume(tmp_path):
    path = tmp_path / "x.npy"
    with AppendableNpyWriter(path, 2) as w:
        w.append(np.ones((3, 2)))
    # resume in a new writer: existing rows are counted, appends continue
    with AppendableNpyWriter(path, 2) as w:
        assert w.rows == 3
        w.append(np.full((2, 2), 2.0))
    data = np.load(path)
    assert data.shape == (5, 2)
    np.testing.assert_allclose(data[3:], 2.0)


def test_appendable_writer_rejects_bad_shape(tmp_path):
    path = tmp_path / "x.npy"
    with AppendableNpyWriter(path, 2) as w:
        w.append(np.ones((1, 2)))
    with pytest.raises(ValueError):
        AppendableNpyWriter(path, 5)


def test_generate_public_dets(tmp_path):
    stats = run_generate(FIXTURE, tmp_path, detector="public")
    assert set(stats) == {"MOT17-02-FRCNN", "MOT17-04-FRCNN"}
    path = det_cache_path(tmp_path, "public", "MOT17-02-FRCNN")
    assert path.exists()
    per_frame = load_cached_dets_per_frame(path, 4)
    assert sum(len(d) for d in per_frame) == stats["MOT17-02-FRCNN"]["dets"]
    # rerun is a no-op resume (same row counts)
    stats2 = run_generate(FIXTURE, tmp_path, detector="public")
    assert stats2 == stats


# ---------------------------------------------------------------------------
# mask caches, embeddings-only fill, autobatch (reference cache.py:468-1024,
# inference.py:332-388)
# ---------------------------------------------------------------------------


def test_mask_pack_roundtrip():
    from boxmot_tpu.data.cache import pack_masks, unpack_masks

    rng = np.random.default_rng(0)
    masks = np.zeros((3, 240, 320), np.uint8)
    for i in range(3):
        x, y = rng.integers(0, 200), rng.integers(0, 120)
        masks[i, y:y + 80, x:x + 100] = 1
    rows = pack_masks(5, masks)
    assert rows.shape[0] == 3 and rows[0, 0] == 5
    back = unpack_masks(rows, (240, 320))
    assert back.shape == (3, 240, 320)
    # IoU of roundtripped mask with original is high (resample loss only)
    for i in range(3):
        inter = (back[i] & (masks[i] > 0)).sum()
        union = (back[i] | (masks[i] > 0)).sum()
        assert inter / union > 0.9


class FakeSegDetector:
    """Deterministic detector emitting two boxes + aligned masks."""

    def __call__(self, img):
        from boxmot_tpu.detectors.base import Detections

        H, W = img.shape[:2]
        dets = np.array(
            [[10, 10, 60, 90, 0.9, 0.0], [100, 40, 170, 140, 0.8, 0.0]],
            np.float32,
        )
        masks = np.zeros((2, H, W), np.uint8)
        masks[0, 10:90, 10:60] = 1
        masks[1, 40:140, 100:170] = 1
        return Detections(
            xyxy=dets[:, :4], conf=dets[:, 4], cls=dets[:, 5], masks=masks
        )


class FakeReID:
    feature_dim = 8
    model_name = "fake_reid"

    def get_features(self, boxes, img):
        # deterministic per-box embedding: normalized box coords
        out = np.zeros((len(boxes), 8), np.float32)
        out[:, :4] = np.asarray(boxes, np.float32) / 1000.0
        out[:, 4] = 1.0
        return out


def test_generate_seg_masks_and_cache_replay(tmp_path):
    from boxmot_tpu.data.cache import load_cached_masks_per_frame, mask_cache_path

    stats = run_generate(
        FIXTURE, tmp_path, detector="fakeseg", detector_model=FakeSegDetector()
    )
    seq = "MOT17-02-FRCNN"
    assert stats[seq]["masks"] == stats[seq]["dets"] > 0
    mp = mask_cache_path(tmp_path, "fakeseg", seq)
    assert mp.exists()
    masks_pf = load_cached_masks_per_frame(mp, 4, (1080, 1920))
    assert masks_pf[0].shape[0] == 2  # two dets per frame
    assert masks_pf[0].any()

    # sam2mot replays from the mask cache through run_eval
    from boxmot_tpu.engine.eval import run_eval

    res = run_eval(
        FIXTURE, "sam2mot", cache_root=tmp_path, detector="fakeseg"
    )
    assert "HOTA" in res["combined"]


def test_generate_embeddings_only_fill(tmp_path):
    from boxmot_tpu.data.cache import emb_cache_path

    # first pass: detector-driven det cache only
    run_generate(FIXTURE, tmp_path, detector="fakeseg", detector_model=FakeSegDetector())
    # second pass: embeddings-only (no detector_model) must align to the
    # CACHED rows, not the public det.txt rows
    stats = run_generate(
        FIXTURE, tmp_path, detector="fakeseg", reid_model=FakeReID()
    )
    seq = "MOT17-02-FRCNN"
    ep = emb_cache_path(tmp_path, "fakeseg", "fake_reid", seq, "resize")
    embs = np.load(ep)
    assert embs.shape == (stats[seq]["dets"], 1 + 8)
    # embedding rows derive from the cached (fake detector) boxes
    np.testing.assert_allclose(embs[0, 1:5], [0.01, 0.01, 0.06, 0.09], atol=1e-6)


def test_autobatcher_backoff():
    from boxmot_tpu.utils.autobatch import AutoBatcher

    calls = []

    def flaky(chunk):
        calls.append(len(chunk))
        if len(chunk) > 4:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory allocating")
        return np.asarray(chunk) * 2.0

    ab = AutoBatcher(batch_size=16, auto=True)
    out = ab.map(flaky, np.arange(20.0))
    np.testing.assert_allclose(out, np.arange(20.0) * 2)
    assert ab.batch_size == 4  # settled at the safe size
    # non-OOM errors propagate
    def broken(chunk):
        raise ValueError("no")

    with pytest.raises(ValueError):
        AutoBatcher(batch_size=8).map(broken, np.arange(4))


def test_generate_reid_autobatch(tmp_path):
    stats = run_generate(
        FIXTURE, tmp_path, detector="public", reid_model=FakeReID(),
        batch_size=3, auto_batch=True,
    )
    seq = "MOT17-02-FRCNN"
    assert stats[seq]["embs"] == stats[seq]["dets"]
