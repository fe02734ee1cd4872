"""Segmentation tracking: external masks feeding Sam2Mot (or any tracker).

Script port of the reference's examples/seg/torchvision_boxmot.ipynb.
The reference drives Mask R-CNN; any mask source works — trackers take
masks as an external input (`tracker.update(dets, img, masks=masks)`).
Offline here: masks are synthesized as ellipses inside the MOT17-mini
fixture's public detection boxes.  Swap `synth_masks` for your
segmentation model's output to use a real one.

Run::

    python examples/seg/mask_tracking.py [--tracker sam2mot]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from boxmot_tpu import create_tracker  # noqa: E402
from boxmot_tpu.data.loaders import iter_source  # noqa: E402

FIXTURE = REPO / "assets" / "MOT17-mini" / "train" / "MOT17-02-FRCNN"


def load_public_dets(seq_dir: Path):
    rows = np.loadtxt(seq_dir / "det" / "det.txt", delimiter=",")
    per_frame = []
    for f in range(1, int(rows[:, 0].max()) + 1):
        r = rows[rows[:, 0] == f]
        per_frame.append(
            np.stack(
                [r[:, 2], r[:, 3], r[:, 2] + r[:, 4], r[:, 3] + r[:, 5],
                 r[:, 6], np.zeros(len(r))],
                axis=1,
            ).astype(np.float32)
        )
    return per_frame


def synth_masks(dets: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """(N,6) boxes -> (N,H,W) bool ellipse masks (stand-in for a real
    segmentation model's output)."""
    H, W = hw
    yy, xx = np.mgrid[0:H, 0:W]
    masks = np.zeros((len(dets), H, W), bool)
    for i, d in enumerate(dets):
        cx, cy = (d[0] + d[2]) / 2, (d[1] + d[3]) / 2
        rx = max((d[2] - d[0]) / 2, 1.0)
        ry = max((d[3] - d[1]) / 2, 1.0)
        masks[i] = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
    return masks


def overlay(frame: np.ndarray, masks: np.ndarray, ids) -> np.ndarray:
    rng_color = lambda tid: tuple(
        int(c) for c in np.random.default_rng(int(tid)).integers(60, 255, 3)
    )
    out = frame.copy()
    for m, tid in zip(masks, ids):
        color = np.array(rng_color(tid), np.uint8)
        out[m.astype(bool)] = (0.5 * out[m.astype(bool)] + 0.5 * color).astype(
            np.uint8
        )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracker", default="sam2mot",
                    help="sam2mot consumes masks natively; box trackers "
                    "carry them through to TrackResults.masks")
    ap.add_argument("--max-frames", type=int, default=30)
    ap.add_argument("--save-video", default=None)
    args = ap.parse_args(argv)

    dets_per_frame = load_public_dets(FIXTURE)
    tracker = create_tracker(args.tracker)

    writer = None
    for i, (path, frame) in enumerate(iter_source(str(FIXTURE / "img1"))):
        if i >= args.max_frames or i >= len(dets_per_frame):
            break
        dets = dets_per_frame[i]
        masks = synth_masks(dets, frame.shape[:2])
        res = tracker.update(dets, frame, masks=masks)
        print(f"frame {i:3d}: {len(dets):2d} masks -> {len(res):2d} tracks")
        if args.save_video and len(res):
            import cv2

            vis = overlay(frame, res.masks, res.id) if res.masks is not None \
                else frame
            if writer is None:
                writer = cv2.VideoWriter(
                    args.save_video, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                    (frame.shape[1], frame.shape[0]),
                )
            writer.write(vis)
    if writer is not None:
        writer.release()
        print(f"[example] wrote {args.save_video}")


if __name__ == "__main__":
    main()
