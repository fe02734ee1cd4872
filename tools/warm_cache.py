"""Precompile the suite's XLA programs into the persistent compile cache.

Cold-compile is the dominant fixed cost of both the test suite and the
TPU benchmarks: every (tracker, capacity, det-bucket) scan program
costs seconds on CPU and 1-4 minutes on a tunneled TPU the first time.
This tool pays that cost once, ahead of time, into the same persistent
cache the consumers read:

  * default (CPU x8 virtual devices, the test environment): runs the
    canonical `run_eval` replay for every tracker on the bundled
    fixtures — exactly the programs `tests/test_pinned_metrics.py`,
    `tests/test_reference_txt_pins.py` and the parity suites compile —
    plus one live-step compile per tracker.  Cache dir:
    tests/.jax_cache/<machine-tag>/ (shared with pytest, keyed by HLO
    hash so stale entries are never wrong, only unused).
  * --tpu: compiles the benchmark programs (replay scan at the bench
    det bucket, ReID forwards) on the real chip into
    .tpu_jax_cache/ — run before a benchmarking session so the
    measurement scripts start warm.

Usage::

    python tools/warm_cache.py                # test-suite programs
    python tools/warm_cache.py --trackers bytetrack,ocsort
    python tools/warm_cache.py --tpu          # benchmark programs
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

BOX_TRACKERS = (
    "bytetrack", "ocsort", "sfsort", "botsort", "occluboost",
    "boosttrack", "deepocsort", "strongsort", "hybridsort",
)
OBB_TRACKERS = ("bytetrack", "botsort", "ocsort", "sfsort", "occluboost")


def _setup_backend(tpu: bool) -> None:
    if not tpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if tpu:
        cache = REPO / ".tpu_jax_cache"
    else:
        jax.config.update("jax_platforms", "cpu")
        # share the pytest cache (tests/conftest.py machine-tag scoping)
        sys.path.insert(0, str(REPO / "tests"))
        import conftest  # noqa: F401  (sets cache dir + thresholds)

        return
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def warm_eval_programs(trackers, verbose=True):
    """Compile the run_eval replay program set for each tracker on the
    bundled fixtures (the exact code path the pinned-metric and parity
    tests take)."""
    from boxmot_tpu.engine.eval import run_eval

    mini = REPO / "assets" / "MOT17-mini" / "train"
    synth = REPO / "assets" / "synth-long"
    for name in trackers:
        t0 = time.time()
        run_eval(mini, name)
        if verbose:
            print(f"  run_eval[{name}] mot17-mini  {time.time() - t0:6.1f}s")
        if synth.exists():
            t0 = time.time()
            run_eval(synth, name)
            if verbose:
                print(f"  run_eval[{name}] synth-long  {time.time() - t0:6.1f}s")


def warm_obb_programs(trackers, verbose=True):
    from boxmot_tpu.engine.eval_obb import run_eval_obb

    root = REPO / "assets" / "mmot-mini" / "train"
    if not root.exists():
        return
    for name in trackers:
        if name not in OBB_TRACKERS:
            continue
        t0 = time.time()
        try:
            run_eval_obb(root, name)
        except Exception as exc:  # fixture layout differences are fine
            if verbose:
                print(f"  run_eval_obb[{name}] skipped: {exc}")
            continue
        if verbose:
            print(f"  run_eval_obb[{name}]        {time.time() - t0:6.1f}s")


def warm_live_steps(trackers, verbose=True):
    """One live-step compile per tracker (the update() bucket tests hit)."""
    import numpy as np

    from boxmot_tpu.trackers.zoo import create_tracker

    rng = np.random.default_rng(0)
    img = np.zeros((128, 128, 3), np.uint8)
    for name in trackers:
        t0 = time.time()
        trk = create_tracker(
            name,
            tracker_config={"with_reid": False}
            if name in ("botsort", "occluboost")
            else None,
        )
        for n in (7, 30):
            x = rng.uniform(0, 100, (n, 1)).astype(np.float32)
            dets = np.concatenate(
                [x, x, x + 20, x + 40, rng.uniform(0.4, 1, (n, 1)).astype(np.float32),
                 np.zeros((n, 1), np.float32)], axis=1)
            trk.update(dets, img)
        if verbose:
            print(f"  live[{name}]                {time.time() - t0:6.1f}s")


def warm_tpu_bench(trackers, verbose=True):
    """Benchmark-shaped programs on the real chip: replay scan at the
    bench det bucket + the ReID pipelines benchmark_reid measures."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boxmot_tpu.engine.replay import init_state, pack_frames, scan_replay
    from boxmot_tpu.trackers.zoo import create_tracker

    rng = np.random.default_rng(0)
    for name in trackers:
        t0 = time.time()
        trk = create_tracker(
            name,
            tracker_config={"with_reid": False}
            if name in ("botsort", "occluboost")
            else None,
        )
        x = rng.uniform(0, 1800, (8, 100, 1)).astype(np.float32)
        frames = [
            np.concatenate(
                [x[i], x[i] * 0.5, x[i] + 60, x[i] * 0.5 + 150,
                 rng.uniform(0.4, 1, (100, 1)).astype(np.float32),
                 np.zeros((100, 1), np.float32)], axis=1)
            for i in range(8)
        ]
        packed, _ = pack_frames(frames)
        _, outs, _ = scan_replay(trk.cfg, init_state(trk.cfg), jnp.asarray(packed))
        jax.block_until_ready(outs)
        if verbose:
            print(f"  tpu replay[{name}]          {time.time() - t0:6.1f}s")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trackers", default=",".join(BOX_TRACKERS))
    ap.add_argument("--tpu", action="store_true",
                    help="warm benchmark programs on the real chip instead")
    ap.add_argument("--skip-obb", action="store_true")
    args = ap.parse_args(argv)

    _setup_backend(args.tpu)
    sys.path.insert(0, str(REPO))
    trackers = [t for t in args.trackers.split(",") if t]

    t0 = time.time()
    if args.tpu:
        warm_tpu_bench(trackers)
    else:
        warm_live_steps(trackers)
        warm_eval_programs(trackers)
        if not args.skip_obb:
            warm_obb_programs(trackers)
    print(f"warm in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
