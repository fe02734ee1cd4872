"""Compute the pinned metric values for tests/test_pinned_metrics.py.

Runs each tracker over the committed fixtures (MOT17-mini + synth-long)
on the CPU backend (same configuration as the test suite: 8 virtual
devices) and prints a JSON blob of exact HOTA/MOTA/IDF1 values, plus the
reference-implementation MOT txt metrics for the cross-stack pin.

Usage: python tools/compute_pinned_metrics.py
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)
import jax

jax.config.update("jax_platforms", "cpu")

# share the pytest persistent compile cache (same machine-tag scoping),
# so this tool warms the suite and vice versa
sys.path.insert(0, str(REPO / "tests"))
import conftest  # noqa: E402,F401

import numpy as np  # noqa: E402


def metrics_of(res):
    c = res["combined"]
    return {k: round(float(c[k]), 6) for k in ("HOTA", "MOTA", "IDF1")}


def main():
    from boxmot_tpu.engine.eval import run_eval

    out = {}
    for root_name, root in [
        ("mot17_mini", REPO / "assets" / "MOT17-mini" / "train"),
        ("synth_long", REPO / "assets" / "synth-long" / "train"),
    ]:
        # every tracker, through the same run_eval path the CLI uses;
        # appearance trackers run motion-only (reid=None), matching how
        # the suite evaluates them without weights (engine/eval.py:134)
        for trk in [
            "bytetrack",
            "ocsort",
            "sfsort",
            "botsort",
            "deepocsort",
            "strongsort",
            "boosttrack",
            "occluboost",
            "hybridsort",
            "sam2mot",
            "bytetrack:cpp",
            "occluboost:cpp",
        ]:
            key = f"{root_name}/{trk}"
            try:
                out[key] = metrics_of(run_eval(root, trk))
            except Exception as exc:
                out[key] = {"error": f"{type(exc).__name__}: {exc}"}
            print(key, "->", out[key], flush=True)

    # Reference-stack txt on the synth fixture -> repo metrics
    sys.path.insert(0, str(REPO / "tests"))
    from refshim import load_reference, reference_available

    if reference_available():
        load_reference()
        import contextlib
        import io

        from boxmot.trackers import ByteTrack as RefByteTrack

        from boxmot_tpu.data.mot import MOTDataset
        from boxmot_tpu.engine.metrics.mot_metrics import (
            evaluate_sequences,
            preprocess_sequence,
        )
        from boxmot_tpu.engine.mot_io import convert_to_mot_format

        ds = MOTDataset(REPO / "assets" / "synth-long" / "train")
        seq_data = {}
        for seq in ds.sequences:
            with contextlib.redirect_stdout(io.StringIO()):
                trk = RefByteTrack()
            img = np.zeros((seq.info.im_height, seq.info.im_width, 3), np.uint8)
            rows = []
            for f, d in enumerate(seq.dets_per_frame()):
                o = np.asarray(trk.update(d, img))
                if len(o):
                    rows.append(convert_to_mot_format(o, frame_idx=f + 1))
            mot = np.concatenate(rows) if rows else np.zeros((0, 9))
            seq_data[seq.name] = preprocess_sequence(
                seq.gt(), mot.astype(np.float64), seq.seq_length
            )
        combined = evaluate_sequences(seq_data)["combined"]
        out["synth_long/reference_bytetrack_txt"] = {
            k: round(float(combined[k]), 6) for k in ("HOTA", "MOTA", "IDF1")
        }
        print("synth_long/reference_bytetrack_txt ->",
              out["synth_long/reference_bytetrack_txt"], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
