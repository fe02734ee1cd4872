"""Exact pinned HOTA/MOTA/IDF1 values on the committed fixtures.

Replaces the `0 < HOTA < 1` style sanity bound (VERDICT r1, weak #2):
the eval pipeline is deterministic on the CPU test backend, so any
change to tracker semantics, metric preprocessing (distractor
filtering, ambiguous-IoU tie-breaks), or MOT txt formatting moves
these numbers and fails loudly.

Values were computed by ``tools/compute_pinned_metrics.py`` (CPU x8
backend — the same configuration conftest.py forces for the suite).
The ``reference_bytetrack_txt`` pin feeds MOT txt produced by the
ACTUAL reference implementation (via tests/refshim) into the repo
metric stack, so the metric conventions are cross-checked against
reference-generated outputs, not just repo-generated ones (reference:
boxmot/engine/eval/trackeval/runner.py:67-339).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.engine.eval import run_eval

ASSETS = Path(__file__).resolve().parent.parent / "assets"
MOT17_MINI = ASSETS / "MOT17-mini" / "train"
SYNTH_LONG = ASSETS / "synth-long" / "train"

# tools/compute_pinned_metrics.py output, 2026-08-17
PINNED = {
    ("mot17_mini", "bytetrack"): {"HOTA": 0.649859, "MOTA": 0.495283, "IDF1": 0.662461},
    ("mot17_mini", "ocsort"): {"HOTA": 0.651511, "MOTA": 0.488208, "IDF1": 0.656101},
    ("mot17_mini", "sfsort"): {"HOTA": 0.654495, "MOTA": 0.497642, "IDF1": 0.664567},
    ("mot17_mini", "botsort"): {"HOTA": 0.652681, "MOTA": 0.495283, "IDF1": 0.662461},
    ("mot17_mini", "deepocsort"): {"HOTA": 0.652269, "MOTA": 0.492925, "IDF1": 0.660348},
    ("mot17_mini", "strongsort"): {"HOTA": 0.466670, "MOTA": 0.341981, "IDF1": 0.509666},
    ("mot17_mini", "boosttrack"): {"HOTA": 0.649366, "MOTA": 0.495283, "IDF1": 0.662461},
    ("mot17_mini", "occluboost"): {"HOTA": 0.649804, "MOTA": 0.492925, "IDF1": 0.660348},
    ("mot17_mini", "hybridsort"): {"HOTA": 0.653064, "MOTA": 0.497642, "IDF1": 0.664567},
    ("mot17_mini", "sam2mot"): {"HOTA": 0.658509, "MOTA": 0.504717, "IDF1": 0.672897},
    ("mot17_mini", "bytetrack:cpp"): {"HOTA": 0.649859, "MOTA": 0.495283, "IDF1": 0.662461},
    ("mot17_mini", "occluboost:cpp"): {"HOTA": 0.649804, "MOTA": 0.492925, "IDF1": 0.660348},
    ("synth_long", "bytetrack"): {"HOTA": 0.952785, "MOTA": 0.996300, "IDF1": 0.968698},
    ("synth_long", "ocsort"): {"HOTA": 0.885979, "MOTA": 0.933777, "IDF1": 0.935373},
    ("synth_long", "sfsort"): {"HOTA": 0.898791, "MOTA": 0.980762, "IDF1": 0.916468},
    ("synth_long", "botsort"): {"HOTA": 0.952210, "MOTA": 0.996670, "IDF1": 0.968877},
    ("synth_long", "deepocsort"): {"HOTA": 0.885492, "MOTA": 0.932667, "IDF1": 0.934837},
    ("synth_long", "strongsort"): {"HOTA": 0.861006, "MOTA": 0.910840, "IDF1": 0.853037},
    ("synth_long", "boosttrack"): {"HOTA": 0.940187, "MOTA": 0.984832, "IDF1": 0.962756},
    ("synth_long", "occluboost"): {"HOTA": 0.970771, "MOTA": 0.995930, "IDF1": 0.997963},
    ("synth_long", "hybridsort"): {"HOTA": 0.851414, "MOTA": 0.892342, "IDF1": 0.882638},
    ("synth_long", "sam2mot"): {"HOTA": 0.845008, "MOTA": 0.914909, "IDF1": 0.848808},
    ("synth_long", "bytetrack:cpp"): {"HOTA": 0.952785, "MOTA": 0.996300, "IDF1": 0.968698},
    ("synth_long", "occluboost:cpp"): {"HOTA": 0.970771, "MOTA": 0.995930, "IDF1": 0.997963},
}

ROOTS = {"mot17_mini": MOT17_MINI, "synth_long": SYNTH_LONG}

# Tight enough that any semantic change trips it; loose enough for
# benign float-reduction reordering.
ATOL = 1e-4


def assert_pinned(combined, expect):
    got = {k: float(combined[k]) for k in expect}
    for k, v in expect.items():
        assert abs(got[k] - v) <= ATOL, (k, got, expect)


@pytest.mark.parametrize(
    "root_name, tracker",
    sorted(PINNED),
    ids=[f"{r}-{t}" for r, t in sorted(PINNED)],
)
def test_pinned_eval_metrics(root_name, tracker, tmp_path):
    res = run_eval(ROOTS[root_name], tracker, output_dir=tmp_path)
    assert_pinned(res["combined"], PINNED[(root_name, tracker)])


def test_cpp_backend_matches_device_backend_exactly():
    """The pins above already encode it, but state the invariant
    directly: the native cores and the XLA programs yield identical
    metrics on both fixtures."""
    for root in ("mot17_mini", "synth_long"):
        for trk in ("bytetrack", "occluboost"):
            assert PINNED[(root, trk)] == PINNED[(root, f"{trk}:cpp")]


@pytest.mark.slow
def test_reference_generated_txt_metrics_pinned():
    """Reference-implementation ByteTrack txt -> repo metric stack."""
    from tests.refshim import load_reference, reference_available

    if not reference_available():
        pytest.skip("reference tree not present")
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

    ds = MOTDataset(SYNTH_LONG)
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
    assert_pinned(
        combined, {"HOTA": 0.952972, "MOTA": 0.996300, "IDF1": 0.968698}
    )
    # and the repo tracker's pinned HOTA is within 4e-4 of the
    # reference's on the same 400-frame scene — the residual is the
    # documented near-tie divergence budget
    assert abs(0.952785 - float(combined["HOTA"])) < 4e-4
