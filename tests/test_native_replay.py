"""Native replay paths: in-process ctypes loop + boxmot_replay executable."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"


def _dets_cache(tmp_path, dets_per_frame):
    rows = []
    for f, d in enumerate(dets_per_frame):
        for r in d:
            rows.append([f + 1, *r])
    arr = np.array(rows, np.float32).reshape(-1, 7)
    path = tmp_path / "dets.npy"
    np.save(path, arr)
    return path


def test_replay_sequence_native_matches_device_metrics():
    """cpp replay through run_eval lands within 1 HOTA of the device path."""
    from boxmot_tpu.engine.eval import run_eval

    dev = run_eval(FIXTURE, tracker_type="bytetrack")
    cpp = run_eval(FIXTURE, tracker_type="bytetrack:cpp")
    for metric in ("HOTA", "MOTA", "IDF1"):
        assert abs(dev["combined"][metric] - cpp["combined"][metric]) < 0.01, metric


def test_replay_executable_matches_inprocess(tmp_path):
    """boxmot_replay output is identical to the ctypes in-process loop."""
    from boxmot_tpu.data.mot import MOTDataset
    from boxmot_tpu.engine.mot_io import read_mot_results, write_mot_results
    from boxmot_tpu.native.replay import replay_cache_cpp, replay_sequence_native

    seq = MOTDataset(FIXTURE).sequences[0]
    dets = seq.dets_per_frame()[:60]
    cache = _dets_cache(tmp_path, dets)

    rows_py = replay_sequence_native("bytetrack", dets)
    py_txt = tmp_path / "py.txt"
    write_mot_results(py_txt, rows_py)

    seen = []
    cpp_txt = tmp_path / "cpp.txt"
    summary = replay_cache_cpp(
        "bytetrack",
        cache,
        cpp_txt,
        seq_len=len(dets),
        progress=lambda f, t: seen.append((f, t)),
    )
    assert summary["frames"] == len(dets)
    assert seen and seen[-1] == (len(dets), len(dets))

    a = read_mot_results(py_txt)
    b = read_mot_results(cpp_txt)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_eval_cpp_thread_pool_matches_serial():
    """n_workers > 1 replays sequences in a thread pool with identical
    metrics (the reference's per-sequence replay pool)."""
    from boxmot_tpu.engine.eval import run_eval

    serial = run_eval(FIXTURE, tracker_type="bytetrack:cpp")
    pooled = run_eval(FIXTURE, tracker_type="bytetrack:cpp", n_workers=4)
    for metric in ("HOTA", "MOTA", "IDF1"):
        assert serial["combined"][metric] == pooled["combined"][metric]


def test_replay_executable_obb(tmp_path):
    """(N, 8) OBB caches replay through the executable, emitting
    13-col corner-format rows (engine/eval_obb.py convention)."""
    from boxmot_tpu.native.replay import replay_cache_cpp

    rows = []
    for f in range(8):
        rows.append([f + 1, 100 + 5 * f, 100, 60, 24, 0.3, 0.9, 0])
    np.save(tmp_path / "d.npy", np.array(rows, np.float32))
    out = tmp_path / "o.txt"
    summary = replay_cache_cpp("bytetrack_obb", tmp_path / "d.npy", out, seq_len=8)
    assert summary == {"frames": 8, "rows": 8}
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 8
    assert all(len(l.split(",")) == 13 for l in lines)

    # mismatched layout is rejected with a clear error
    with pytest.raises(RuntimeError, match="does not match"):
        replay_cache_cpp("bytetrack", tmp_path / "d.npy", tmp_path / "x.txt", seq_len=8)


def test_eval_obb_cpp_matches_device():
    """OBB benchmark eval on the native core matches the device path."""
    from boxmot_tpu.engine.eval_obb import run_eval_obb

    root = FIXTURE.parent.parent / "mmot-mini" / "train"
    dev = run_eval_obb(root, "bytetrack")
    cpp = run_eval_obb(root, "bytetrack:cpp")
    for metric in ("HOTA", "MOTA", "IDF1"):
        assert abs(dev["combined"][metric] - cpp["combined"][metric]) < 1e-6


def test_tune_over_cpp_backend(tmp_path):
    """Hyperparameter trials replay on the native cores (cheap CPU
    trials, the reference's Ray-Tune-over-replay pattern)."""
    from boxmot_tpu.engine.tuning.tuner import run_tune

    best = run_tune(
        FIXTURE, "bytetrack:cpp", n_trials=2, work_dir=tmp_path, seed=0
    )
    assert "params" in best and "track_thresh" in best["params"]
    assert (tmp_path / "trials.json").exists()


def test_cli_eval_cpp_backend(tmp_path):
    """`eval --tracker name:cpp` runs the native cores through the CLI."""
    from click.testing import CliRunner

    from boxmot_tpu.engine.cli import cli

    result = CliRunner().invoke(
        cli,
        [
            "eval",
            "--data",
            str(FIXTURE),
            "--tracker",
            "ocsort:cpp",
            "--output-dir",
            str(tmp_path),
        ],
    )
    assert result.exit_code == 0, result.output
    assert "HOTA" in result.output
    assert (tmp_path / "MOT17-02-FRCNN.txt").exists()


def test_replay_executable_min_conf(tmp_path):
    """min_conf filters detections before tracking."""
    from boxmot_tpu.engine.mot_io import read_mot_results
    from boxmot_tpu.native.replay import replay_cache_cpp

    dets = [
        np.array([[10, 10, 60, 110, 0.9, 0], [200, 20, 260, 140, 0.3, 0]], np.float32)
        for _ in range(5)
    ]
    cache = _dets_cache(tmp_path, dets)
    out = tmp_path / "o.txt"
    replay_cache_cpp("bytetrack", cache, out, seq_len=5, min_conf=0.5)
    rows = read_mot_results(out)
    assert len(rows) == 5  # one track per frame; low-conf det filtered
    assert set(rows[:, 1]) == {1}


def test_replay_executable_config_params(tmp_path):
    """Tracker params reach the executable (capacity via config string)."""
    from boxmot_tpu.native.replay import replay_cache_cpp

    dets = [np.array([[10, 10, 60, 110, 0.9, 0]], np.float32)]
    cache = _dets_cache(tmp_path, dets)
    out = tmp_path / "o.txt"
    summary = replay_cache_cpp(
        "ocsort", cache, out, tracker_params={"min_hits": 1}, seq_len=1
    )
    assert summary["rows"] == 1
