"""ReID embedding throughput benchmark (the BASELINE "embeddings/sec").

Measures the full device pipeline — crop + resize + standardize + model
forward + L2 norm, one XLA program per crop-count bucket — on the
default backend (real TPU when available).  Embeddings/sec counts
crops, matching the reference's staged ReID timing convention
(boxmot/utils/timing.py add_reid_phase_time).

Timing methodology (axon tunnel semantics, established empirically —
see docs/performance.md "tunnel timing"):

  * Before the first device->host read, ``jax.block_until_ready`` does
    NOT fence: launches are acknowledged immediately (a 275-TFLOP chain
    "completed" in 0.0 s when timed that way).  Any number measured in
    that mode is phantom.
  * The FIRST d2h read of a process flushes the queue and costs
    8-120 s regardless of size.
  * AFTER that read ("poisoned" mode), dispatch is honest: launches are
    still async (~1 ms enqueue overhead), ``block_until_ready`` truly
    waits, and a verification read returns in milliseconds.  A
    perfectly pipelined bf16 matmul chain measures 96% of the v5e
    peak in this mode, confirming the fence is real.

So every measurement here: warm up, pay the one-time poison read, then
time K launches over DISTINCT staged inputs + block_until_ready, and
verify with a cheap read that adds ~nothing (asserted).  Rows whose
implied FLOP rate exceeds the chip peak are flagged and must not be
published.

Usage::

    python -m tests.performance.benchmark_reid \
        --models osnet_x0_25,osnet_x1_0 --counts 16,64 --repeat 20
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

DEFAULT_MODELS = ("osnet_x0_25", "osnet_x1_0")
DEFAULT_COUNTS = (16, 64, 128)
IMG_HW = (1080, 1920)


def _boxes(rng, n):
    x = rng.uniform(0, IMG_HW[1] - 200, n)
    y = rng.uniform(0, IMG_HW[0] - 300, n)
    return np.stack(
        [x, y, x + rng.uniform(40, 160, n), y + rng.uniform(90, 280, n)], axis=-1
    ).astype(np.float32)


V5E_BF16_PEAK_FLOPS = 197e12  # per-chip bf16 peak, TPU v5e

_POISONED = False


def ensure_honest_dispatch():
    """Pay the one-time first-read tax so block_until_ready fences."""
    global _POISONED
    if _POISONED:
        return 0.0
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.ones((8, 8))
    np.asarray(jax.jit(lambda a: a @ a)(x))
    _POISONED = True
    return time.perf_counter() - t0


def model_flops(reid, img, boxes):
    """XLA cost-analysis FLOPs for one forward call (crop+model+norm)."""
    import jax
    import jax.numpy as jnp

    n = len(boxes)
    img_d = jax.device_put(jnp.asarray(img))
    boxes_d = jax.device_put(jnp.asarray(boxes))
    valid_d = jax.device_put(jnp.ones((n,), bool))
    try:
        lowered = jax.jit(reid._forward).lower(
            reid.variables, img_d, boxes_d, valid_d
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        return 0.0


def bench_device(reid, img, boxes, repeat, pipeline=20):
    """Pipelined throughput: `pipeline` launches over DISTINCT staged box
    buffers (identical launches could be deduplicated in ways that
    overstate throughput), block_until_ready in honest-dispatch mode,
    then a verification read that must be ~free."""
    import jax
    import jax.numpy as jnp

    n = len(boxes)
    img_d = jax.device_put(jnp.asarray(img))
    rng = np.random.default_rng(42)
    boxes_variants = [
        jax.device_put(
            jnp.asarray(boxes + rng.uniform(0, 3, boxes.shape).astype(np.float32))
        )
        for _ in range(pipeline)
    ]
    valid_d = jax.device_put(jnp.ones((n,), bool))
    out = reid._forward(reid.variables, img_d, boxes_variants[0], valid_d)
    jax.block_until_ready(out)
    ensure_honest_dispatch()
    samples = []
    for _ in range(max(repeat // 4, 3)):
        t0 = time.perf_counter()
        outs = [
            reid._forward(reid.variables, img_d, b, valid_d)
            for b in boxes_variants
        ]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / pipeline
        t0 = time.perf_counter()
        first = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]
        t_verify = time.perf_counter() - t0
        if not np.isfinite(first):
            raise RuntimeError("non-finite embeddings from timed program")
        if t_verify > max(0.25, 0.5 * dt * pipeline):
            raise RuntimeError(
                f"verification read took {t_verify:.3f}s after a "
                f"{dt * pipeline:.3f}s block — fence was not real"
            )
        samples.append(dt)
    return float(np.median(samples))


def bench_device_sync(reid, img, boxes, repeat):
    """Single-launch latency: block after every launch (no pipelining).
    Upper bound on per-frame time; includes ~1 ms tunnel enqueue."""
    import jax
    import jax.numpy as jnp

    n = len(boxes)
    img_d = jax.device_put(jnp.asarray(img))
    boxes_d = jax.device_put(jnp.asarray(boxes))
    valid_d = jax.device_put(jnp.ones((n,), bool))
    out = reid._forward(reid.variables, img_d, boxes_d, valid_d)
    jax.block_until_ready(out)
    ensure_honest_dispatch()
    samples = []
    for _ in range(max(repeat, 5)):
        t0 = time.perf_counter()
        out = reid._forward(reid.variables, img_d, boxes_d, valid_d)
        jax.block_until_ready(out)
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def bench_host(reid, img, boxes, repeat):
    """End-to-end `get_features` incl. frame upload + result download."""
    reid.get_features(boxes, img)  # warm
    samples = []
    for _ in range(max(repeat // 2, 3)):
        t0 = time.perf_counter()
        feats = reid.get_features(boxes, img)
        assert feats.shape[0] == len(boxes)
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(DEFAULT_MODELS))
    ap.add_argument("--counts", default=",".join(map(str, DEFAULT_COUNTS)))
    ap.add_argument("--repeat", type=int, default=20)
    ap.add_argument("--json", dest="json_path", default=None)
    ap.add_argument("--skip-host", action="store_true")
    ap.add_argument("--half", action="store_true",
                    help="bf16 params + activations (the deployment "
                    "configuration; fp32 convs run far below the MXU's "
                    "bf16 peak, which MFU is normalized against)")
    args = ap.parse_args(argv)
    models = [m.strip() for m in args.models.split(",") if m.strip()]
    counts = [int(c) for c in args.counts.split(",") if c.strip()]

    from boxmot_tpu.reid.core import ReID

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*IMG_HW, 3), np.uint8)

    rows = []
    for m in models:
        reid = ReID(model_name=m, half=args.half)
        for n in counts:
            boxes = _boxes(rng, n)
            flops = model_flops(reid, img, boxes)
            dt = bench_device(reid, img, boxes, args.repeat)
            dt_sync = bench_device_sync(reid, img, boxes, args.repeat)
            tflops = flops / dt / 1e12 if flops else 0.0
            mfu = tflops * 1e12 / V5E_BF16_PEAK_FLOPS if flops else 0.0
            row = {
                "model": m,
                "half": bool(args.half),
                "crops": n,
                "ms_per_frame_device": round(dt * 1e3, 3),
                "ms_per_frame_sync": round(dt_sync * 1e3, 3),
                "embeddings_per_s": round(n / dt, 1),
                "gflops_per_call": round(flops / 1e9, 1),
                "tflops": round(tflops, 1),
                "mfu_vs_v5e_peak": round(mfu, 3),
            }
            if mfu > 1.0:
                row["WARNING"] = (
                    "implied FLOP rate exceeds v5e bf16 peak - measurement "
                    "artifact, do not publish"
                )
            if not args.skip_host:
                dt_host = bench_host(reid, img, boxes, args.repeat)
                row["ms_per_frame_host"] = round(dt_host * 1e3, 3)
                row["embeddings_per_s_host"] = round(n / dt_host, 1)
            rows.append(row)
            print(json.dumps(row), flush=True)
        del reid

    print(
        f"\n{'model':<16}{'crops':>6}{'ms dev':>9}{'ms host':>9}"
        f"{'emb/s':>12}{'MFU':>7}"
    )
    for r in rows:
        print(
            f"{r['model']:<16}{r['crops']:>6}{r['ms_per_frame_device']:>9}"
            f"{r.get('ms_per_frame_host', float('nan')):>9}"
            f"{r['embeddings_per_s']:>12}{r['mfu_vs_v5e_peak']:>7}"
        )
    if args.json_path:
        with open(args.json_path, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main()
