"""Tests for callbacks, FrameCache, and the Detector convenience class."""

import numpy as np
import pytest
from PIL import Image

from boxmot_tpu.data.frame_cache import FrameCache, available_ram_bytes, read_frame
from boxmot_tpu.detectors.base import Detections
from boxmot_tpu.detectors.detector import Detector
from boxmot_tpu.detectors.registry import PublicDetections
from boxmot_tpu.utils.callbacks import (
    CallbackRegistry,
    safe_progress_callback,
    safe_seq_progress_callback,
)


class TestCallbacks:
    def test_safe_progress_none_passthrough(self):
        assert safe_progress_callback(None) is None
        assert safe_seq_progress_callback(None) is None

    def test_safe_progress_swallows(self):
        calls = []

        def bad(msg):
            calls.append(msg)
            raise RuntimeError("boom")

        wrapped = safe_progress_callback(bad)
        wrapped("hello")  # must not raise
        assert calls == ["hello"]

    def test_safe_seq_progress_swallows(self):
        wrapped = safe_seq_progress_callback(lambda *a: 1 / 0)
        wrapped("seq", 1, 10)  # must not raise

    def test_registry_fire_and_remove(self):
        reg = CallbackRegistry()
        seen = []
        fn = lambda x: seen.append(x)
        reg.add("evt", fn)
        reg.add("evt", lambda x: 1 / 0)  # suppressed
        reg.fire("evt", 42)
        assert seen == [42]
        assert reg.events() == ["evt"]
        reg.remove("evt", fn)
        reg.fire("evt", 43)
        assert seen == [42]
        reg.remove("evt", fn)  # removing twice is a no-op


def _write_frames(tmp_path, n=3, size=(16, 12)):
    paths = []
    for i in range(n):
        arr = np.full((size[1], size[0], 3), i * 40, dtype=np.uint8)
        p = tmp_path / f"{i:06d}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


class TestFrameCache:
    def test_available_ram(self):
        b = available_ram_bytes()
        assert b is None or b > 0

    def test_decoded_tier_roundtrip(self, tmp_path):
        paths = _write_frames(tmp_path)
        cache = FrameCache(paths, min_free_bytes=0)
        assert cache.active and cache.mode == "decoded"
        img = cache.read_image(paths[1])
        assert img.shape == (12, 16, 3)
        # BGR copy of a constant-value frame
        assert int(img[0, 0, 0]) == 40
        # mutation of the returned copy must not poison the cache
        img[:] = 0
        assert int(cache.read_image(paths[1])[0, 0, 0]) == 40

    def test_raw_tier(self, tmp_path):
        paths = _write_frames(tmp_path)
        cache = FrameCache(paths, min_free_bytes=0)
        cache.mode = "raw"  # force tier-2 path; raw dict unpopulated
        # falls through to disk fallback without error
        assert cache.read_image(paths[0]).shape == (12, 16, 3)

    def test_budget_too_small_disables(self, tmp_path):
        paths = _write_frames(tmp_path)
        cache = FrameCache(paths, budget_fraction=0.0)
        assert not cache.active
        # fallback still serves images
        assert cache.read_image(paths[0]).shape == (12, 16, 3)

    def test_missing_path_uses_fallback(self, tmp_path):
        paths = _write_frames(tmp_path)
        cache = FrameCache(paths, min_free_bytes=0)
        with pytest.raises(FileNotFoundError):
            cache.read_image(tmp_path / "nope.png")

    def test_context_manager_clears(self, tmp_path):
        paths = _write_frames(tmp_path)
        with FrameCache(paths, min_free_bytes=0) as cache:
            assert cache.active
        assert not cache.active and cache.cached_bytes == 0

    def test_npy_frames(self, tmp_path):
        arr = np.random.randint(0, 255, (8, 10, 3), dtype=np.uint8)
        p = tmp_path / "frame.npy"
        np.save(p, arr)
        np.testing.assert_array_equal(read_frame(p), arr)


class TestDetector:
    def _backend(self, n_frames=3):
        dets = [
            np.array([[10, 10, 50, 50, 0.9, 0], [60, 60, 90, 90, 0.8, 0]], np.float32)
            for _ in range(n_frames)
        ]
        return PublicDetections(dets)

    def test_single_frame_call(self):
        det = Detector(self._backend())
        out = det(np.zeros((32, 32, 3), np.uint8))
        assert isinstance(out, Detections) and len(out) == 2

    def test_stream_over_directory(self, tmp_path):
        _write_frames(tmp_path, n=3)
        det = Detector(self._backend())
        results = list(det(tmp_path, stream=True))
        assert len(results) == 3
        for ident, frame, dets in results:
            assert frame.shape == (12, 16, 3) and len(dets) == 2
        assert det.frame_idx == 3
        assert det.timing.counts["det_process"] == 3

    def test_eager_returns_list(self, tmp_path):
        _write_frames(tmp_path, n=2)
        det = Detector(self._backend())
        out = det(tmp_path)
        assert isinstance(out, list) and len(out) == 2

    def test_callbacks_fire_in_order(self, tmp_path):
        _write_frames(tmp_path, n=2)
        det = Detector(self._backend())
        events = []
        det.add_callback("on_predict_start", lambda d: events.append("start"))
        det.add_callback("on_predict_frame_end", lambda d, i, r: events.append("frame"))
        det.add_callback("on_predict_end", lambda d: events.append("end"))
        det(tmp_path)
        assert events == ["start", "frame", "frame", "end"]

    def test_unknown_event_rejected(self):
        det = Detector(self._backend())
        with pytest.raises(ValueError):
            det.add_callback("on_bogus", lambda d: None)

    def test_vid_stride(self, tmp_path):
        _write_frames(tmp_path, n=4)
        det = Detector(self._backend(), vid_stride=2)
        assert len(det(tmp_path)) == 2
