"""Smoke-run the bundled examples end-to-end.

The examples are the ported reference notebooks
(reference: examples/det/yolox_boxmot.ipynb, examples/det/obb.ipynb,
examples/seg/torchvision_boxmot.ipynb) as offline-capable scripts; these
tests execute each one's ``main`` in-process (sharing the suite's CPU
backend and compile cache) with small frame budgets so a docs reader
can trust that the commands in the examples actually run.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = REPO / "examples"


def _load(rel: str):
    path = EXAMPLES / rel
    name = "example_" + path.stem
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_det_yolox_tracking_fixture_replay(capsys):
    mod = _load("det/yolox_tracking.py")
    mod.main(["--max-frames", "8"])
    out = capsys.readouterr().out
    assert "replaying public detections" in out
    # tracks must actually appear on the fixture within a few frames
    assert any(
        "-> " in line and " tracks" in line and not line.split("-> ")[1].startswith(" 0")
        for line in out.splitlines() if line.startswith("frame")
    ), out


def test_det_obb_tracking(capsys):
    mod = _load("det/obb_tracking.py")
    # min_hits=10 in the example config: run past it so tracks emit
    mod.main(["--frames", "16"])
    out = capsys.readouterr().out
    assert "OBB tracks" in out, out


def test_seg_mask_tracking(capsys, tmp_path):
    mod = _load("seg/mask_tracking.py")
    mod.main(["--max-frames", "6"])
    out = capsys.readouterr().out
    assert "masks ->" in out, out


def test_pose_tracking_fixture_replay(capsys):
    mod = _load("pose/pose_tracking.py")
    mod.main(["--max-frames", "8"])
    out = capsys.readouterr().out
    assert "synthetic keypoints" in out
    # keypoint sets must re-associate onto emitted tracks
    assert any(
        line.startswith("frame") and " keypoint sets" in line
        and not line.split("tracks, ")[1].startswith(" 0")
        for line in out.splitlines()
    ), out


@pytest.mark.slow
def test_pose_tracking_liteyolo_detector(capsys):
    """The vendored pose head end-to-end (mirrors the reference CI's
    `boxmot track --detector yolov8n-pose.pt`, ci.yml:398-424)."""
    mod = _load("pose/pose_tracking.py")
    mod.main(["--max-frames", "2", "--detector", "yololiten-pose.pt"])
    out = capsys.readouterr().out
    assert "pose model: yololiten-pose.pt" in out


@pytest.mark.slow
def test_det_example_saves_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    mod = _load("det/yolox_tracking.py")
    dest = tmp_path / "out.mp4"
    mod.main(["--max-frames", "6", "--save-video", str(dest)])
    assert dest.exists() and dest.stat().st_size > 0
