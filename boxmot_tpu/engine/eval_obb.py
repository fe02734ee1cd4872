"""Oriented-box benchmark evaluation (MMOT layout).

Role mirror of the reference's OBB eval path (engine/eval/trackeval/
datasets/mot_challenge_obb.py + the mmot benchmark): replay OBB
detections through an oriented tracker, write corner-format results,
and score class-averaged HOTA/CLEAR/Identity with rotated-IoU matching
(the MMOT table convention, README.md:105 class-averaged over
categories).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from boxmot_tpu.data.mmot import MmotDataset
from boxmot_tpu.engine.metrics.mot_metrics import (
    evaluate_obb_results,
    obb_to_corners,
)


def track_sequence_obb(cfg, dets_per_frame) -> np.ndarray:
    """Replay per-frame (Ni, 7) OBB dets; returns corner-format rows
    (M, 13) [frame, id, x1..y4, conf, cls, vis=1]."""
    import jax

    from boxmot_tpu.engine.replay import init_state, pack_frames, scan_replay

    packed, n_frames = pack_frames(dets_per_frame, det_cols=7)
    state = init_state(cfg)
    _, outs, masks = scan_replay(cfg, state, jax.numpy.asarray(packed))
    outs = np.asarray(outs)[:n_frames]
    masks = np.asarray(masks)[:n_frames]

    rows = []
    for f in range(n_frames):
        out = outs[f][masks[f]]
        if not len(out):
            continue
        # out: (M, 10) [cx, cy, w, h, angle, id, conf, cls, det_ind, _]
        corners = obb_to_corners(out[:, :5])
        rows.append(
            np.column_stack(
                [
                    np.full(len(out), f + 1, np.float32),
                    out[:, 5],  # id
                    corners,
                    out[:, 6],  # conf
                    out[:, 7],  # cls
                    np.ones(len(out), np.float32),
                ]
            )
        )
    return np.concatenate(rows) if rows else np.zeros((0, 13), np.float32)


def track_sequence_obb_native(
    tracker_type: str, dets_per_frame, tracker_params: dict | None = None
) -> np.ndarray:
    """track_sequence_obb on a native OBB core (backend="cpp")."""
    from boxmot_tpu.trackers.zoo import create_tracker

    trk = create_tracker(
        tracker_type, backend="cpp", evolve_param_dict=tracker_params or None
    )
    rows = []
    for f, dets in enumerate(dets_per_frame):
        out = np.asarray(trk.update(np.asarray(dets, np.float32).reshape(-1, 7)))
        if not len(out):
            continue
        corners = obb_to_corners(out[:, :5])
        rows.append(
            np.column_stack(
                [
                    np.full(len(out), f + 1, np.float32),
                    out[:, 5],
                    corners,
                    out[:, 6],
                    out[:, 7],
                    np.ones(len(out), np.float32),
                ]
            )
        )
    return np.concatenate(rows) if rows else np.zeros((0, 13), np.float32)


def run_eval_obb(
    data_root: Path,
    tracker_type: str = "bytetrack",
    tracker_params: dict | None = None,
    output_dir: Path | None = None,
    per_class: bool = True,
    verbose: bool = False,
) -> dict:
    """Evaluate an oriented tracker over an MMOT split.

    Detections come from the ground truth (gt-as-dets) — the
    cached-detector path can feed ``track_sequence_obb`` directly when
    OBB det caches exist.  Returns class-averaged metrics plus per-class
    breakdowns (the reference's MMOT convention).
    """
    import tempfile

    from boxmot_tpu.engine.eval import build_replay_config
    from boxmot_tpu.engine.results import ValidationResult

    dataset = MmotDataset(data_root)
    if len(dataset) == 0:
        raise ValueError(f"no MMOT sequences under {data_root}")
    # "name:cpp" replays on the native OBB cores
    from boxmot_tpu.trackers.zoo import parse_tracker_spec

    tracker_type, tracker_backend = parse_tracker_spec(tracker_type)
    params = dict(tracker_params or {})
    if tracker_backend == "cpp":
        cfg = None
    else:
        params["is_obb"] = True
        cfg = build_replay_config(tracker_type, **params)

    out_root = Path(output_dir) if output_dir else None
    with tempfile.TemporaryDirectory() as tmp:
        res_root = out_root or Path(tmp)
        res_root.mkdir(parents=True, exist_ok=True)
        seq_lengths = {}
        all_classes: set[int] = set()
        for seq in dataset:
            if tracker_backend == "cpp":
                rows = track_sequence_obb_native(
                    tracker_type, seq.gt_as_obb_dets(), params
                )
            else:
                rows = track_sequence_obb(cfg, seq.gt_as_obb_dets())
            np.savetxt(res_root / f"{seq.name}.txt", rows, delimiter=",",
                       fmt="%.10g")
            seq_lengths[seq.name] = seq.seq_length
            all_classes.update(seq.classes())
            if verbose:
                print(f"tracked {seq.name}: {len(rows)} rows")

        gt_root = Path(data_root) / "mot"
        if per_class and all_classes:
            per_cls = {}
            for cls_id in sorted(all_classes):
                r = evaluate_obb_results(
                    gt_root, res_root, seq_lengths=seq_lengths, cls_id=cls_id
                )
                per_cls[cls_id] = r["combined"]
            keys = ("HOTA", "MOTA", "IDF1")
            combined = {
                k: float(np.mean([c[k] for c in per_cls.values()])) for k in keys
            }
            return ValidationResult(
                {"per_class": per_cls, "combined": combined,
                 "per_seq": {}}
            )
        r = evaluate_obb_results(gt_root, res_root, seq_lengths=seq_lengths)
        return ValidationResult(r)
