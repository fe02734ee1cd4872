"""Detection + tracking: YOLOX (TPU-native flax) feeding BotSort.

Script port of the reference's examples/det/yolox_boxmot.ipynb, offline
capable: by default it replays the MOT17-mini fixture's public
detections (no weights download needed); pass --weights to run the
real YOLOX forward + device NMS instead, and --source to track any
video/webcam/image-dir the loaders support.

Run::

    python examples/det/yolox_tracking.py                    # fixture replay
    python examples/det/yolox_tracking.py --weights yolox_s_mot17.pt \
        --source path/to/video.mp4 --show
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
from boxmot_tpu.detectors.registry import (  # noqa: E402
    PublicDetections,
    YoloXDetector,
)

FIXTURE = REPO / "assets" / "MOT17-mini" / "train" / "MOT17-02-FRCNN"


def load_public_dets(seq_dir: Path):
    """MOT det.txt -> per-frame (N,6) arrays (x1,y1,x2,y2,conf,cls)."""
    rows = np.loadtxt(seq_dir / "det" / "det.txt", delimiter=",")
    per_frame = []
    for f in range(1, int(rows[:, 0].max()) + 1):
        r = rows[rows[:, 0] == f]
        dets = np.stack(
            [r[:, 2], r[:, 3], r[:, 2] + r[:, 4], r[:, 3] + r[:, 5],
             r[:, 6], np.zeros(len(r))],
            axis=1,
        ).astype(np.float32)
        per_frame.append(dets)
    return per_frame


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="yolox_*.pt checkpoint; omit to replay fixture dets")
    ap.add_argument("--source", default=str(FIXTURE / "img1"),
                    help="video / webcam index / image dir / glob")
    ap.add_argument("--tracker", default="botsort")
    ap.add_argument("--conf", type=float, default=0.45)
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--save-video", default=None, help="output mp4 path")
    ap.add_argument("--max-frames", type=int, default=50)
    args = ap.parse_args(argv)

    if args.weights:
        detector = YoloXDetector(args.weights, conf=args.conf)
    else:
        detector = PublicDetections(load_public_dets(FIXTURE))
        print(f"[example] replaying public detections from {FIXTURE}")

    # motion-only here so the example runs without ReID weights; pass a
    # ReID model via create_tracker(..., reid_model=ReID(...)) to enable
    # the appearance path
    tracker = create_tracker(args.tracker, with_reid=False)

    writer = None
    for i, (path, frame) in enumerate(iter_source(args.source)):
        if i >= args.max_frames:
            break
        dets = detector(frame).as_dets()
        res = tracker.update(dets, frame)
        frame = tracker.plot_results(frame, show_trajectories=True)
        print(f"frame {i:4d}: {len(dets):2d} dets -> {len(res):2d} tracks "
              f"ids={sorted(int(t) for t in res.id)[:8]}")
        if args.save_video:
            import cv2

            if writer is None:
                writer = cv2.VideoWriter(
                    args.save_video, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                    (frame.shape[1], frame.shape[0]),
                )
            writer.write(frame)
        if args.show:
            import cv2

            cv2.imshow("boxmot_tpu + YOLOX", frame)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    if writer is not None:
        writer.release()
        print(f"[example] wrote {args.save_video}")


if __name__ == "__main__":
    main()
