"""Oriented-bounding-box tracking with OC-SORT.

Script port of the reference's examples/det/obb.ipynb: two synthetic
targets follow parabolic paths with the box angle matching the curve
tangent; the tracker consumes (N,7) [cx,cy,w,h,angle,conf,cls] rows
and emits (M,9) tracks.  Fully offline.

Run::

    python examples/det/obb_tracking.py [--save-video out.mp4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from boxmot_tpu import create_tracker  # noqa: E402


def parabolic_dets(i: int) -> np.ndarray:
    """Two OBB detections whose angle tracks the trajectory tangent
    (reference examples/det/obb.ipynb)."""
    x1, y1 = 144 + i, 212 + 0.01 * i**2
    a1 = np.arctan(0.02 * i)
    x2, y2 = 425 + i, 281 + 0.02 * i**2
    a2 = np.arctan(0.04 * i)
    return np.array(
        [
            [x1, y1, 45, 30, a1, 0.82, 0],
            [x2, y2, 45, 30, a2, 0.72, 65],
        ],
        np.float32,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracker", default="ocsort")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--save-video", default=None)
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args(argv)

    tracker = create_tracker(
        args.tracker,
        asso_func="centroid",
        min_hits=10,
        asso_threshold=0.98,
        det_thresh=0.7,
        max_age=20,
        use_byte=True,
        Q_xy_scaling=0.01,
        Q_s_scaling=0.0001,
    )

    writer = None
    for i in range(args.frames):
        frame = np.zeros((1080, 1080, 3), np.uint8)
        res = tracker.update(parabolic_dets(i), frame)
        assert res.shape[1] == 9 or len(res) == 0  # OBB rows: (M,9)
        frame = tracker.plot_results(frame, show_trajectories=True)
        if len(res):
            ids = sorted(int(t) for t in res[:, 5])
            print(f"frame {i:3d}: {len(res)} OBB tracks ids={ids} "
                  f"angles={np.round(res[:, 4], 2).tolist()}")
        if args.save_video:
            import cv2

            if writer is None:
                writer = cv2.VideoWriter(
                    args.save_video, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                    (1080, 1080),
                )
            writer.write(frame)
        if args.show:
            import cv2

            cv2.imshow("boxmot_tpu OBB", frame)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    if writer is not None:
        writer.release()
        print(f"[example] wrote {args.save_video}")


if __name__ == "__main__":
    main()
