"""FPS benchmark across trackers and detection counts.

Mirror of the reference sweep (tests/performance/benchmark_fps.py:1-25):
measures pure tracker throughput on synthetic detections — no detector,
no ReID model; appearance trackers receive pre-computed random
embeddings.  Two modes per tracker:

  * live:   per-frame `tracker.update(...)` through the host API
            (includes the host->device transfer the live path pays)
  * replay: the on-device `lax.scan` over a whole sequence — the
            deployment-shape fast path (the TPU analogue of the
            reference's C++ backend column)
  * cpp:    per-frame update on the native slot-bank cores
            (`backend="cpp"`, the reference's C++ column itself)

Usage::

    python -m tests.performance.benchmark_fps \
        --trackers bytetrack,ocsort --counts 10,100 --frames 256

Writes one JSON line per (tracker, mode, count) and a summary table.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

DEFAULT_TRACKERS = (
    "bytetrack", "ocsort", "sfsort", "botsort", "occluboost",
    "boosttrack", "deepocsort", "strongsort", "hybridsort",
)
DEFAULT_COUNTS = (10, 50, 100)
IMG_HW = (1080, 1920)

REPLAYABLE = set(DEFAULT_TRACKERS)


def _make_dets(n, rng, n_frames):
    """Synthetic (F, n, 6) detection stream with light motion."""
    h, w = IMG_HW
    x = rng.uniform(0, w - 200, n)
    y = rng.uniform(0, h - 300, n)
    bw = rng.uniform(40, 150, n)
    bh = rng.uniform(80, 280, n)
    vx = rng.uniform(-4, 4, n)
    vy = rng.uniform(-2, 2, n)
    frames = []
    for f in range(n_frames):
        x1 = np.clip(x + vx * f, 0, w - 1)
        y1 = np.clip(y + vy * f, 0, h - 1)
        conf = rng.uniform(0.5, 1.0, n)
        frames.append(
            np.stack([x1, y1, x1 + bw, y1 + bh, conf, np.zeros(n)], axis=-1).astype(
                np.float32
            )
        )
    return frames


def bench_live(name, dets_frames, warmup=5):
    from boxmot_tpu.trackers.zoo import create_tracker

    trk = create_tracker(name, tracker_config={"with_reid": False} if name in ("botsort", "occluboost") else None)
    img = np.zeros((64, 64, 3), np.uint8)
    for f in range(warmup):
        trk.update(dets_frames[f % len(dets_frames)], img)
    t0 = time.perf_counter()
    for dets in dets_frames:
        trk.update(dets, img)
    dt = time.perf_counter() - t0
    return len(dets_frames) / dt


def bench_replay(name, dets_frames):
    import jax
    import jax.numpy as jnp

    from boxmot_tpu.engine.replay import init_state, pack_frames, scan_replay
    from boxmot_tpu.trackers.zoo import TRACKER_MAPPING, create_tracker

    trk = create_tracker(name, tracker_config={"with_reid": False} if name in ("botsort", "occluboost") else None)
    cfg = trk.cfg
    packed, n_frames = pack_frames(dets_frames)
    packed = jnp.asarray(packed)
    state = init_state(cfg)
    _, outs, _ = scan_replay(cfg, state, packed)  # compile + warmup
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    _, outs, _ = scan_replay(cfg, init_state(cfg), packed)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return n_frames / dt


def bench_cpp(name, dets_frames, warmup=5):
    from boxmot_tpu.trackers.zoo import create_tracker

    trk = create_tracker(name, backend="cpp")
    img = np.zeros((64, 64, 3), np.uint8)
    for f in range(warmup):
        trk.update(dets_frames[f % len(dets_frames)], img)
    trk.reset()
    t0 = time.perf_counter()
    for dets in dets_frames:
        trk.update(dets, img)
    dt = time.perf_counter() - t0
    return len(dets_frames) / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trackers", default=",".join(DEFAULT_TRACKERS))
    ap.add_argument("--counts", default=",".join(map(str, DEFAULT_COUNTS)))
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--modes", default="live,replay,cpp")
    ap.add_argument("--json", dest="json_path", default=None)
    args = ap.parse_args(argv)

    from boxmot_tpu.trackers.zoo import TRACKER_MAPPING

    trackers = [t.strip() for t in args.trackers.split(",") if t.strip()]
    unknown = [t for t in trackers if t not in TRACKER_MAPPING]
    if unknown:
        print(f"skipping unknown trackers: {unknown} "
              f"(available: {sorted(TRACKER_MAPPING)})")
        trackers = [t for t in trackers if t not in unknown]
    counts = [int(c) for c in args.counts.split(",") if c.strip()]
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    rng = np.random.default_rng(0)

    rows = []
    for name in trackers:
        for count in counts:
            dets = _make_dets(count, rng, args.frames)
            for mode in modes:
                if mode == "replay" and name not in REPLAYABLE:
                    continue
                if mode == "cpp":
                    from boxmot_tpu import native
                    from boxmot_tpu.native.trackers import NATIVE_LIVE_TRACKERS

                    if name not in NATIVE_LIVE_TRACKERS or not native.native_available():
                        continue
                fn = {"live": bench_live, "replay": bench_replay, "cpp": bench_cpp}[mode]
                try:
                    fps = fn(name, dets)
                except Exception as exc:  # report, keep sweeping
                    print(f"{name} {mode} n={count}: FAILED {exc}")
                    continue
                row = {"tracker": name, "mode": mode, "dets": count, "fps": round(fps, 1)}
                rows.append(row)
                print(json.dumps(row))

    print(f"\n{'tracker':<12}{'mode':<8}{'dets':>6}{'fps':>12}")
    for r in rows:
        print(f"{r['tracker']:<12}{r['mode']:<8}{r['dets']:>6}{r['fps']:>12.1f}")
    if args.json_path:
        with open(args.json_path, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main()
