"""Postprocessing: GSI / GBRC / GTA behaviors."""

import numpy as np
import pytest

from boxmot_tpu.postprocessing import create_postprocessor, supported_postprocessors
from boxmot_tpu.postprocessing.gsi import GSIPostprocessor, linear_interpolation
from boxmot_tpu.postprocessing.gbrc import GBRCPostprocessor
from boxmot_tpu.postprocessing.gta import (
    Tracklet,
    build_tracklets,
    detect_id_switch,
    find_consecutive_segments,
    get_distance,
    merge_tracklets,
    split_tracklets,
    tracklets_to_rows,
)


def mot_rows(entries):
    """entries: (frame, id, x, y, w, h)."""
    return np.array([[f, i, x, y, w, h, 0.9, 1, -1] for f, i, x, y, w, h in entries], float)


class TestLinearInterpolation:
    def test_fills_gap(self):
        rows = mot_rows([(1, 5, 0, 0, 10, 20), (4, 5, 30, 0, 10, 20)])
        out = linear_interpolation(rows, interval=20)
        assert len(out) == 4
        frames = sorted(out[:, 0].astype(int))
        assert frames == [1, 2, 3, 4]
        # interpolated x at frame 2 should be 10, frame 3 -> 20
        d = {int(r[0]): r[2] for r in out}
        np.testing.assert_allclose([d[2], d[3]], [10.0, 20.0])

    def test_gap_beyond_interval_not_filled(self):
        rows = mot_rows([(1, 5, 0, 0, 10, 20), (40, 5, 30, 0, 10, 20)])
        out = linear_interpolation(rows, interval=20)
        assert len(out) == 2

    def test_different_ids_not_bridged(self):
        rows = mot_rows([(1, 5, 0, 0, 10, 20), (4, 6, 30, 0, 10, 20)])
        out = linear_interpolation(rows, interval=20)
        assert len(out) == 2


class TestSmoothers:
    def _jittery_track(self, n=30):
        rng = np.random.default_rng(0)
        entries = [
            (f, 1, 100 + 3 * f + rng.normal(0, 2), 50, 20, 40) for f in range(1, n + 1)
        ]
        return mot_rows(entries)

    def test_gsi_reduces_jitter(self):
        rows = self._jittery_track()
        out = GSIPostprocessor()(rows)
        assert out.shape[0] == rows.shape[0]
        resid_in = np.diff(rows[:, 2], 2).std()
        resid_out = np.diff(out[:, 2], 2).std()
        assert resid_out < resid_in

    def test_gbrc_runs(self):
        rows = self._jittery_track()
        out = GBRCPostprocessor()(rows)
        assert out.shape[0] == rows.shape[0]
        assert np.all(np.isfinite(out))


class TestGTA:
    def _emb(self, seed, dim=16):
        rng = np.random.default_rng(seed)
        v = rng.normal(0, 1, dim)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def test_find_consecutive_segments(self):
        assert find_consecutive_segments([1, 2, 3, 7, 8, 12]) == [(0, 2), (3, 4), (5, 5)]

    def test_get_distance_overlap_is_one(self):
        a = Tracklet(1, [1, 2], [0.9] * 2, [[0, 0, 1, 1]] * 2, [0] * 2, [self._emb(0)] * 2)
        b = Tracklet(2, [2, 3], [0.9] * 2, [[0, 0, 1, 1]] * 2, [0] * 2, [self._emb(0)] * 2)
        assert get_distance(a, b) == 1.0

    def test_merge_same_identity(self):
        f = self._emb(1)
        a = Tracklet(1, [1, 2, 3], [0.9] * 3, [[10, 10, 5, 10]] * 3, [0] * 3, [f] * 3)
        b = Tracklet(2, [10, 11], [0.9] * 2, [[12, 10, 5, 10]] * 2, [0] * 2, [f] * 2)
        merged = merge_tracklets({1: a, 2: b}, 0.4, 100.0, 100.0)
        assert len(merged) == 1
        assert sorted(next(iter(merged.values())).times) == [1, 2, 3, 10, 11]

    def test_no_merge_distinct_identity(self):
        a = Tracklet(1, [1, 2], [0.9] * 2, [[10, 10, 5, 10]] * 2, [0] * 2, [self._emb(1)] * 2)
        b = Tracklet(2, [10, 11], [0.9] * 2, [[12, 10, 5, 10]] * 2, [0] * 2, [self._emb(2)] * 2)
        merged = merge_tracklets({1: a, 2: b}, 0.4, 100.0, 100.0)
        assert len(merged) == 2

    def test_split_mixed_identity(self):
        fa, fb = self._emb(3), self._emb(4)
        n = 120
        feats = [fa + np.random.default_rng(i).normal(0, 0.01, 16).astype(np.float32) for i in range(n // 2)]
        feats += [fb + np.random.default_rng(1000 + i).normal(0, 0.01, 16).astype(np.float32) for i in range(n // 2)]
        trk = Tracklet(
            1, list(range(1, n + 1)), [0.9] * n, [[0, 0, 5, 10]] * n, [0] * n, feats
        )
        out = split_tracklets({1: trk}, eps=0.5, min_samples=5, len_thres=100)
        assert len(out) == 2
        sizes = sorted(len(t.times) for t in out.values())
        assert sizes == [60, 60]

    def test_build_and_roundtrip(self):
        rows = mot_rows([(1, 1, 0, 0, 10, 20), (2, 1, 2, 0, 10, 20)])
        rows[:, 8] = 0  # det_ind
        embs = [np.stack([self._emb(0)]), np.stack([self._emb(0)])]
        trks = build_tracklets(rows, embs)
        assert list(trks) == [1]
        back = tracklets_to_rows(trks)
        assert back.shape == (2, 9)


def test_registry():
    assert set(supported_postprocessors()) == {"gbrc", "gsi", "gta"}
    p = create_postprocessor("gsi", interval=10)
    assert p.interval == 10
    with pytest.raises(ValueError):
        create_postprocessor("nope")
