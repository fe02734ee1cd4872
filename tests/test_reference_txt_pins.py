"""Reference-generated MOT txt -> repo metric stack, pinned for ALL trackers.

Extends the bytetrack-only reference-txt pin (VERDICT r2, missing #1 /
next-round #3) to every tracker family on both committed fixtures: the
ACTUAL reference implementation (loaded via tests/refshim) tracks the
fixture detections, its outputs are converted to MOT txt rows, and the
repo metric stack scores them.  The pinned values therefore anchor the
metric conventions AND the expected reference-level scores for each
tracker; the repo's own tracker pins live in test_pinned_metrics.py and
the hand-derived convention anchors in test_metrics_handcomputed.py.

Appearance trackers receive deterministic identity-keyed embeddings
(IoU-matched to ground truth, clutter gets unique noise) — the same
protocol as tests/test_reference_parity.py; sam2mot receives filled-box
masks.  Reference: boxmot/engine/eval/trackeval/runner.py:67-339 (the
wrapped TrackEval flow these pins stand in for).

Recompute pins after an intentional change with:
    python tests/test_reference_txt_pins.py
"""

from __future__ import annotations

import contextlib
import io
from pathlib import Path

import numpy as np
import pytest

ASSETS = Path(__file__).resolve().parent.parent / "assets"
FIXTURES = {
    "mot17_mini": ASSETS / "MOT17-mini" / "train",
    "synth_long": ASSETS / "synth-long" / "train",
}

SLOW = pytest.mark.slow


class _DummyReID:
    def get_features(self, *a, **k):  # pragma: no cover
        raise AssertionError("reid model must not be consulted when embs given")


def _tracker_specs():
    """name -> (reference class name, ctor kwargs, needs_embs, needs_masks)."""
    return {
        "bytetrack": ("ByteTrack", {}, False, False),
        "ocsort": ("OcSort", {}, False, False),
        "sfsort": ("SFSORT", {}, False, False),
        "botsort": (
            "BotSort",
            {"with_reid": True, "reid_model": _DummyReID()},
            True,
            False,
        ),
        "deepocsort": ("DeepOcSort", {}, True, False),
        "strongsort": ("StrongSort", {}, True, False),
        "boosttrack": (
            "BoostTrack",
            {"with_reid": True, "reid_model": _DummyReID()},
            True,
            False,
        ),
        "occluboost": (
            "OccluBoost",
            {"with_reid": True, "reid_model": _DummyReID()},
            True,
            False,
        ),
        "hybridsort": ("HybridSort", {"with_reid": True}, True, False),
        "sam2mot": ("Sam2Mot", {}, False, True),
    }


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    xx1 = np.maximum(a[:, None, 0], b[None, :, 0])
    yy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    xx2 = np.minimum(a[:, None, 2], b[None, :, 2])
    yy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    bb = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = aa[:, None] + bb[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


class _IdentityEmbedder:
    """Deterministic embeddings keyed on the GT identity each detection
    IoU-matches (>= 0.5); clutter detections get a unique stable base.
    Same protocol as test_reference_parity.identity_embs."""

    def __init__(self, dim=512, noise=0.03, seed=7):
        self.dim = dim
        self.noise = noise
        self.seed = seed
        self.bases: dict[int, np.ndarray] = {}
        self.rng = np.random.default_rng(seed)

    def _base(self, key: int) -> np.ndarray:
        if key not in self.bases:
            b = np.random.default_rng(self.seed + 1000 + int(key)).normal(size=self.dim)
            self.bases[key] = b / np.linalg.norm(b)
        return self.bases[key]

    def __call__(self, frame_idx, dets, gt_rows):
        embs = np.zeros((len(dets), self.dim), np.float32)
        gt_boxes = np.zeros((0, 4))
        gt_ids = np.zeros(0, int)
        if gt_rows is not None and len(gt_rows):
            gt_boxes = np.concatenate(
                [gt_rows[:, 2:4], gt_rows[:, 2:4] + gt_rows[:, 4:6]], axis=1
            )
            gt_ids = gt_rows[:, 1].astype(int)
        iou = _iou_xyxy(dets[:, :4].astype(np.float64), gt_boxes)
        for r in range(len(dets)):
            if iou.shape[1] and iou[r].max() >= 0.5:
                key = int(gt_ids[int(iou[r].argmax())])
            else:
                key = 10_000_000 + frame_idx * 1000 + r  # unique clutter identity
            e = self._base(key) + self.noise * self.rng.normal(size=self.dim)
            embs[r] = (e / np.linalg.norm(e)).astype(np.float32)
        return embs


def _box_masks(dets, hw):
    H, W = hw
    m = np.zeros((len(dets), H, W), bool)
    for r, d in enumerate(dets):
        x1 = int(np.clip(d[0], 0, W - 1))
        y1 = int(np.clip(d[1], 0, H - 1))
        x2 = int(np.clip(d[2], 0, W - 1))
        y2 = int(np.clip(d[3], 0, H - 1))
        m[r, y1 : y2 + 1, x1 : x2 + 1] = True
    return m


def reference_txt_metrics(fixture_root: Path, tracker: str) -> dict:
    """Run the reference tracker over the fixture; score its MOT txt with
    the repo metric stack; return the combined metrics."""
    from tests.refshim import load_reference

    load_reference()
    import boxmot.trackers as RT

    from boxmot_tpu.data.mot import MOTDataset
    from boxmot_tpu.engine.metrics.mot_metrics import (
        evaluate_sequences,
        preprocess_sequence,
    )
    from boxmot_tpu.engine.mot_io import convert_to_mot_format

    cls_name, kwargs, needs_embs, needs_masks = _tracker_specs()[tracker]
    ds = MOTDataset(fixture_root)
    seq_data = {}
    for seq in ds.sequences:
        with contextlib.redirect_stdout(io.StringIO()):
            trk = getattr(RT, cls_name)(**kwargs)
        gt = seq.gt()
        gt_frames = gt[:, 0].astype(int) if gt.size else np.zeros(0, int)
        hw = (seq.info.im_height, seq.info.im_width)
        img = np.zeros((*hw, 3), np.uint8)
        embedder = _IdentityEmbedder() if needs_embs else None
        rows = []
        for f, dets in enumerate(seq.dets_per_frame()):
            kw = {}
            if needs_embs:
                kw["embs"] = embedder(f + 1, dets, gt[gt_frames == f + 1])
            if needs_masks:
                kw["masks"] = _box_masks(dets, hw)
            out = np.asarray(trk.update(dets, img, **kw))
            if len(out):
                rows.append(convert_to_mot_format(out, frame_idx=f + 1))
        mot = np.concatenate(rows) if rows else np.zeros((0, 9))
        seq_data[seq.name] = preprocess_sequence(
            gt, mot.astype(np.float64), seq.seq_length
        )
    return evaluate_sequences(seq_data)["combined"]


# Computed by running this file directly (reference tracker outputs ->
# repo metric stack), 2026-08-18.
PINNED: dict[tuple[str, str], dict] = {
    ("mot17_mini", "bytetrack"): {"HOTA": 0.650029, "MOTA": 0.502358, "IDF1": 0.668760},
    ("mot17_mini", "ocsort"): {"HOTA": 0.652332, "MOTA": 0.495283, "IDF1": 0.662461},
    ("mot17_mini", "sfsort"): {"HOTA": 0.654495, "MOTA": 0.497642, "IDF1": 0.664567},
    ("mot17_mini", "botsort"): {"HOTA": 0.652681, "MOTA": 0.495283, "IDF1": 0.662461},
    ("mot17_mini", "deepocsort"): {"HOTA": 0.652332, "MOTA": 0.495283, "IDF1": 0.662461},
    ("mot17_mini", "strongsort"): {"HOTA": 0.468131, "MOTA": 0.351415, "IDF1": 0.520070},
    ("mot17_mini", "boosttrack"): {"HOTA": 0.651999, "MOTA": 0.504717, "IDF1": 0.671875},
    ("mot17_mini", "occluboost"): {"HOTA": 0.650849, "MOTA": 0.492925, "IDF1": 0.660348},
    ("mot17_mini", "hybridsort"): {"HOTA": 0.654048, "MOTA": 0.502358, "IDF1": 0.668760},
    ("mot17_mini", "sam2mot"): {"HOTA": 0.658509, "MOTA": 0.504717, "IDF1": 0.672897},
    ("synth_long", "bytetrack"): {"HOTA": 0.952972, "MOTA": 0.996300, "IDF1": 0.968698},
    ("synth_long", "ocsort"): {"HOTA": 0.905752, "MOTA": 0.961524, "IDF1": 0.950517},
    ("synth_long", "sfsort"): {"HOTA": 0.898791, "MOTA": 0.980762, "IDF1": 0.916468},
    ("synth_long", "botsort"): {"HOTA": 0.952210, "MOTA": 0.996670, "IDF1": 0.968877},
    ("synth_long", "deepocsort"): {"HOTA": 0.905752, "MOTA": 0.961524, "IDF1": 0.950517},
    ("synth_long", "strongsort"): {"HOTA": 0.932412, "MOTA": 0.990381, "IDF1": 0.966363},
    ("synth_long", "boosttrack"): {"HOTA": 0.947058, "MOTA": 0.991121, "IDF1": 0.966080},
    ("synth_long", "occluboost"): {"HOTA": 0.947926, "MOTA": 0.992971, "IDF1": 0.966976},
    ("synth_long", "hybridsort"): {"HOTA": 0.931983, "MOTA": 0.991121, "IDF1": 0.966080},
    ("synth_long", "sam2mot"): {"HOTA": 0.845008, "MOTA": 0.914909, "IDF1": 0.848808},
}

ATOL = 1e-4


def _params():
    out = []
    for fixture in FIXTURES:
        for tracker in _tracker_specs():
            marks = []
            # each reference replay is host numpy, 0.1-7s; only the
            # slowest synth-long deep runs leave the default tier
            if fixture == "synth_long" and tracker in (
                "deepocsort",
                "hybridsort",
                "sam2mot",
                "strongsort",
                "occluboost",
                "boosttrack",
            ):
                marks.append(SLOW)
            out.append(pytest.param(fixture, tracker, marks=marks))
    return out


@pytest.mark.parametrize("fixture, tracker", _params())
def test_reference_txt_pin(fixture, tracker):
    from tests.refshim import reference_available

    if not reference_available():
        pytest.skip("reference tree not present")
    expect = PINNED.get((fixture, tracker))
    assert expect is not None, (
        f"no pin for ({fixture}, {tracker}); run "
        f"`python tests/test_reference_txt_pins.py` to compute"
    )
    combined = reference_txt_metrics(FIXTURES[fixture], tracker)
    for k, v in expect.items():
        got = float(combined[k])
        assert abs(got - v) <= ATOL, (fixture, tracker, k, got, v)


if __name__ == "__main__":
    import json
    import sys
    import time

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    pins = {}
    for fixture, root in FIXTURES.items():
        for tracker in _tracker_specs():
            t0 = time.perf_counter()
            c = reference_txt_metrics(root, tracker)
            pins[f"{fixture}/{tracker}"] = {
                "HOTA": round(float(c["HOTA"]), 6),
                "MOTA": round(float(c["MOTA"]), 6),
                "IDF1": round(float(c["IDF1"]), 6),
            }
            print(
                f"{fixture}/{tracker}: {pins[f'{fixture}/{tracker}']} "
                f"({time.perf_counter() - t0:.1f}s)",
                file=sys.stderr,
            )
    print(json.dumps(pins, indent=1))
