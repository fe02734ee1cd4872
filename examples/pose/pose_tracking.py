"""Pose tracking: keypoint detections riding tracked boxes.

Script port of the reference's examples/pose/torchvision_boxmot.ipynb:
a pose model emits boxes + per-person keypoints, the tracker tracks the
boxes, and each track's keypoints are recovered through the det-index
column of the tracker output (the notebook indexes keypoints by track
order, which desyncs when the tracker reorders — det_ind is the exact
re-association).

Offline default: boxes come from the MOT17-mini fixture's public
detections and keypoints are synthesized inside each box (a stand-in
for a real pose model's output, like the seg example's synth masks).
Pass ``--detector yololiten-pose`` to run the vendored LiteYOLO pose
head instead (real forward + keypoint decode on device, random
weights), or swap ``synth_keypoints`` for your own pose model.

Run::

    python examples/pose/pose_tracking.py                   # fixture replay
    python examples/pose/pose_tracking.py --detector yololiten-pose
    python examples/pose/pose_tracking.py --save-video out.mp4
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

# COCO 17-keypoint template, normalized to a unit person box
# (x in [0,1] of box width, y in [0,1] of box height)
_KPT_TEMPLATE = np.array(
    [
        [0.50, 0.08], [0.44, 0.06], [0.56, 0.06], [0.38, 0.08], [0.62, 0.08],
        [0.30, 0.22], [0.70, 0.22], [0.24, 0.38], [0.76, 0.38],
        [0.22, 0.52], [0.78, 0.52], [0.38, 0.54], [0.62, 0.54],
        [0.36, 0.74], [0.64, 0.74], [0.34, 0.94], [0.66, 0.94],
    ],
    np.float32,
)


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


def synth_keypoints(dets: np.ndarray) -> np.ndarray:
    """(N,6) person boxes -> (N,17,3) COCO keypoints (stand-in for a
    real pose model's output)."""
    n = len(dets)
    kpts = np.zeros((n, len(_KPT_TEMPLATE), 3), np.float32)
    for i, d in enumerate(dets):
        w, h = d[2] - d[0], d[3] - d[1]
        kpts[i, :, 0] = d[0] + _KPT_TEMPLATE[:, 0] * w
        kpts[i, :, 1] = d[1] + _KPT_TEMPLATE[:, 1] * h
        kpts[i, :, 2] = d[4]  # keypoint conf = det conf
    return kpts


def get_color(track_id: int) -> tuple[int, int, int]:
    rng = np.random.default_rng(int(track_id))
    return tuple(int(c) for c in rng.integers(0, 255, 3))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tracker", default="botsort")
    ap.add_argument("--detector", default=None,
                    help="pose detector weights stem (e.g. yololiten-pose);"
                    " default replays fixture boxes + synthetic keypoints")
    ap.add_argument("--source", default=str(FIXTURE / "img1"))
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--kpt-conf", type=float, default=0.5,
                    help="min keypoint confidence to draw")
    ap.add_argument("--save-video", default=None, help="output mp4 path")
    ap.add_argument("--max-frames", type=int, default=50)
    args = ap.parse_args(argv)

    detector = None
    public = None
    if args.detector:
        from boxmot_tpu.detectors.registry import UltralyticsDetector

        detector = UltralyticsDetector(args.detector, conf=args.conf)
        print(f"[example] pose model: {args.detector}")
    else:
        public = load_public_dets(FIXTURE)
        print(f"[example] replaying public detections from {FIXTURE} "
              "with synthetic keypoints")

    # motion-only so the example runs without ReID weights
    tracker = create_tracker(args.tracker, with_reid=False)

    writer = None
    for i, (path, frame) in enumerate(iter_source(args.source)):
        if i >= args.max_frames:
            break
        if detector is not None:
            det = detector(frame)
            dets, kpts = det.as_dets(), det.keypoints
            if kpts is None:
                kpts = np.zeros((len(dets), 17, 3), np.float32)
        else:
            dets = public[i] if i < len(public) else public[-1]
            kpts = synth_keypoints(dets)

        res = tracker.update(dets, frame)
        # keypoints follow their detection onto the track via det_ind
        det_ind = res.det_ind.astype(int)
        track_kpts = {
            int(tid): kpts[j]
            for tid, j in zip(res.id, det_ind)
            if 0 <= j < len(kpts)
        }
        print(f"frame {i:4d}: {len(dets):2d} dets -> {len(res):2d} tracks, "
              f"{len(track_kpts):2d} keypoint sets")

        if args.save_video:
            import cv2

            vis = frame.copy()
            for row, tid in zip(np.asarray(res), res.id):
                color = get_color(int(tid))
                x1, y1, x2, y2 = row[:4].astype(int)
                cv2.rectangle(vis, (x1, y1), (x2, y2), color, 2)
                cv2.putText(vis, f"ID {int(tid)}", (x1, y1 - 8),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 2)
                for x, y, kc in track_kpts.get(int(tid), ()):
                    if kc > args.kpt_conf:
                        cv2.circle(vis, (int(x), int(y)), 3, color, -1)
            if writer is None:
                writer = cv2.VideoWriter(
                    args.save_video, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                    (vis.shape[1], vis.shape[0]),
                )
            writer.write(vis)
    if writer is not None:
        writer.release()
        print(f"[example] wrote {args.save_video}")


if __name__ == "__main__":
    main()
