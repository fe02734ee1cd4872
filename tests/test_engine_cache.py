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
