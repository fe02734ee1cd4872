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
    "boosttrack", "deepocsort", "strongsort", "hybridsort", "sam2mot",
)
DEFAULT_COUNTS = (10, 50, 100)
IMG_HW = (1080, 1920)

# sam2mot consumes externally-produced masks; its throughput path is the
# live/cpp step (replay runs from mask caches via run_eval instead)
REPLAYABLE = set(DEFAULT_TRACKERS) - {"sam2mot"}

MASK_HW = (96, 160)  # sam2mot synthetic mask resolution (downsampled frame)


def _make_masks(dets, rng):
    """Box-aligned soft blobs at MASK_HW for sam2mot's mask stream."""
    mh, mw = MASK_HW
    h, w = IMG_HW
    n = len(dets)
    masks = np.zeros((n, mh, mw), np.uint8)
    for i, d in enumerate(dets):
        x1, y1, x2, y2 = d[:4] * [mw / w, mh / h, mw / w, mh / h]
        masks[i, int(y1):max(int(y2), int(y1) + 1),
              int(x1):max(int(x2), int(x1) + 1)] = 1
    return masks


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
    rng = np.random.default_rng(7)
    masks = (
        [_make_masks(d, rng) for d in dets_frames]
        if name == "sam2mot"
        else None
    )

    def _step(f, dets):
        if masks is not None:
            return trk.update(dets, img, masks=masks[f])
        return trk.update(dets, img)

    for f in range(warmup):
        _step(f % len(dets_frames), dets_frames[f % len(dets_frames)])
    t0 = time.perf_counter()
    for f, dets in enumerate(dets_frames):
        _step(f, dets)
    dt = time.perf_counter() - t0
    return len(dets_frames) / dt


def bench_replay(name, dets_frames):
    import jax
    import jax.numpy as jnp

    from boxmot_tpu.engine.replay import init_state, pack_frames, scan_replay
    from boxmot_tpu.trackers.zoo import TRACKER_MAPPING, create_tracker
    from tests.performance.benchmark_reid import ensure_honest_dispatch

    trk = create_tracker(name, tracker_config={"with_reid": False} if name in ("botsort", "occluboost") else None)
    cfg = trk.cfg
    packed, n_frames = pack_frames(dets_frames)
    packed = jnp.asarray(packed)
    state = init_state(cfg)
    _, outs, _ = scan_replay(cfg, state, packed)  # compile + warmup
    jax.block_until_ready(outs)
    # block_until_ready does NOT fence through the tunnel until the
    # process has paid its first device->host read (docs/performance.md);
    # without this the measured "replay fps" is a phantom enqueue rate.
    ensure_honest_dispatch()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, outs, _ = scan_replay(cfg, init_state(cfg), packed)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        first = np.asarray(jax.tree_util.tree_leaves(outs)[0]).ravel()[0]
        t_verify = time.perf_counter() - t0
        if not np.isfinite(first):
            raise RuntimeError("non-finite tracker outputs from timed replay")
        if t_verify > max(0.25, 0.5 * dt):
            raise RuntimeError(
                f"verification read took {t_verify:.3f}s after a {dt:.3f}s "
                f"block — fence was not real"
            )
        samples.append(dt)
    return n_frames / float(np.median(samples))


def bench_cpp(name, dets_frames, warmup=5):
    from boxmot_tpu.trackers.zoo import create_tracker

    trk = create_tracker(name, backend="cpp")
    img = np.zeros((64, 64, 3), np.uint8)
    rng = np.random.default_rng(7)
    masks = (
        [_make_masks(d, rng) for d in dets_frames]
        if name == "sam2mot"
        else None
    )

    def _step(f, dets):
        if masks is not None:
            return trk.update(dets, img, masks=masks[f])
        return trk.update(dets, img)

    for f in range(warmup):
        _step(f % len(dets_frames), dets_frames[f % len(dets_frames)])
    trk.reset()
    t0 = time.perf_counter()
    for f, dets in enumerate(dets_frames):
        _step(f, dets)
    dt = time.perf_counter() - t0
    return len(dets_frames) / dt


def bench_fused(
    tracker: str = "occluboost",
    n_frames: int = 64,
    imgsz=(800, 1440),
    variant: str = "yolox_x",
    reid_name: str | None = "osnet_x1_0",
    max_dets: int = 128,
    half: bool = False,
):
    """End-to-end fused live step (engine/fused.py): YOLOX forward +
    decode + NMS + device crops + ReID embed + tracker step as ONE
    program.  The frame is letterboxed once and staged on device, then
    the program is dispatched n_frames times before ANY result is read
    back — the tunnel-safe pattern (see docs/performance.md), so the
    number is the on-device program rate, not the tunnel round-trip."""
    import jax
    import jax.numpy as jnp

    from boxmot_tpu.detectors.registry import YoloXDetector
    from boxmot_tpu.engine.fused import FusedLiveTracker

    det = YoloXDetector(variant, imgsz=imgsz, num_classes=1, conf=0.05,
                        half=half)
    reid = None
    if reid_name:
        from boxmot_tpu.reid.core import ReID

        reid = ReID(model_name=reid_name, half=half)
    fused = FusedLiveTracker(
        det, reid, tracker, {"use_cmc": False}, max_dets=max_dets
    )
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)
    padded, r = det.preprocess_u8(frame)
    dev_frame = jax.device_put(jnp.asarray(padded))
    scale = jnp.float32(r)
    reid_vars = reid.variables if reid is not None else {}

    from tests.performance.benchmark_reid import ensure_honest_dispatch

    state, out, mask = fused._program(
        det.variables, reid_vars, fused._state, dev_frame, scale
    )  # compile + warmup
    jax.block_until_ready(out)
    ensure_honest_dispatch()  # block_until_ready is fake before first d2h read
    outs = []
    t0 = time.perf_counter()
    for _ in range(n_frames):
        state, out, mask = fused._program(
            det.variables, reid_vars, state, dev_frame, scale
        )
        outs.append(out)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    first = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]
    t_verify = time.perf_counter() - t0
    if not np.isfinite(first):
        raise RuntimeError("non-finite fused outputs from timed program")
    if t_verify > max(0.25, 0.5 * dt):
        raise RuntimeError(
            f"verification read took {t_verify:.3f}s after a {dt:.3f}s "
            f"block — fence was not real"
        )
    return n_frames / dt


def bench_fused_live(
    tracker: str = "occluboost",
    n_frames: int = 64,
    in_flight: int = 8,
    imgsz=(800, 1440),
    variant: str = "yolox_x",
    reid_name: str | None = "osnet_x1_0",
    max_dets: int = 128,
    half: bool = False,
):
    """Realistic fused LIVE rate: distinct frames through
    FusedLiveTracker.update_async with `in_flight` results outstanding.

    Unlike bench_fused (pure on-device program rate on one staged
    frame), every step here pays host letterboxing + frame upload and
    the result readback — but readbacks are deferred behind the
    in-flight window, so device work and tunnel transfers overlap.
    This is the rate a `track` live loop achieves when it drains results
    a few frames late instead of synchronizing per frame
    (reference live loop: boxmot/engine/tracking/workflow.py:138-154,
    one synchronous update per frame)."""
    from boxmot_tpu.detectors.registry import YoloXDetector
    from boxmot_tpu.engine.fused import FusedLiveTracker

    det = YoloXDetector(variant, imgsz=imgsz, num_classes=1, conf=0.05,
                        half=half)
    reid = None
    if reid_name:
        from boxmot_tpu.reid.core import ReID

        reid = ReID(model_name=reid_name, half=half)
    fused = FusedLiveTracker(
        det, reid, tracker, {"use_cmc": False}, max_dets=max_dets
    )
    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)
        for _ in range(min(n_frames, 16))
    ]

    from tests.performance.benchmark_reid import ensure_honest_dispatch

    fused.warmup((1080, 1920))
    ensure_honest_dispatch()

    pending = []
    t0 = time.perf_counter()
    for i in range(n_frames):
        out, mask = fused.update_async(frames[i % len(frames)])
        pending.append((out, mask))
        if len(pending) > in_flight:
            o, m = pending.pop(0)
            np.asarray(o)[np.asarray(m)]  # drain the oldest result
    for o, m in pending:
        np.asarray(o)[np.asarray(m)]
    dt = time.perf_counter() - t0
    return n_frames / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trackers", default=",".join(DEFAULT_TRACKERS))
    ap.add_argument("--counts", default=",".join(map(str, DEFAULT_COUNTS)))
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--modes", default="live,replay,cpp")
    ap.add_argument("--half", action="store_true",
                    help="bf16 detector+reid for the fused modes "
                    "(throughput tier; box coords quantize at bf16)")
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
    fused_modes = {m for m in modes if m in ("fused", "fused-live")}
    if fused_modes:
        # end-to-end fused step (detector+reid+tracker, one dispatch);
        # swept over detector size since that dominates.  "fused" is the
        # on-device program rate (one staged frame); "fused-live" feeds
        # distinct frames via update_async with 8 results in flight.
        modes = [m for m in modes if m not in fused_modes]
        for variant, reid_name in (
            ("yolox_x", "osnet_x1_0"),  # the benchmark detector/reid class
            ("yolox_s", "osnet_x0_25"),  # latency-tier config
        ):
            for trk in ("occluboost", "botsort", "bytetrack"):
                for fmode in sorted(fused_modes):
                    fn = bench_fused if fmode == "fused" else bench_fused_live
                    try:
                        fps = fn(
                            trk, n_frames=args.frames, variant=variant,
                            reid_name=None if trk == "bytetrack" else reid_name,
                            half=args.half,
                        )
                    except Exception as exc:
                        print(f"{fmode} {variant}+{trk}: FAILED {exc}")
                        continue
                    row = {
                        "tracker": trk, "mode": f"{fmode}[{variant}]",
                        "half": bool(args.half),
                        "dets": 128, "fps": round(fps, 1),
                    }
                    rows.append(row)
                    print(json.dumps(row))
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
