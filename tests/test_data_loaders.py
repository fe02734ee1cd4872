"""Frame sources + per-class tracking dispatch."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.data.loaders import iter_source

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"


def test_iter_mot_sequence_dir():
    frames = list(iter_source(FIXTURE / "MOT17-02-FRCNN"))
    assert len(frames) == 4
    path, img = frames[0]
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.dtype == np.uint8


def test_vid_stride():
    frames = list(iter_source(FIXTURE / "MOT17-02-FRCNN", vid_stride=2))
    assert len(frames) == 2


def test_single_image():
    img_path = next((FIXTURE / "MOT17-02-FRCNN" / "img1").glob("*.jpg"))
    frames = list(iter_source(img_path))
    assert len(frames) == 1


def test_glob_pattern():
    pattern = str(FIXTURE / "MOT17-02-FRCNN" / "img1" / "*.jpg")
    frames = list(iter_source(pattern))
    assert len(frames) == 4


def test_missing_source_raises():
    with pytest.raises(FileNotFoundError):
        list(iter_source("/nonexistent/*.jpg"))


def test_per_class_tracking():
    """per_class=True keeps identities separated per object class
    (BaseTracker._do_update per-class dispatch)."""
    from boxmot_tpu.trackers.bytetrack import ByteTrack

    trk = ByteTrack(per_class=True, nr_classes=3)
    img = np.zeros((480, 640, 3), np.uint8)
    # identical boxes, different classes -> distinct ids, never merged
    for _ in range(3):
        dets = np.array(
            [[100, 100, 160, 260, 0.9, 0.0], [100, 100, 160, 260, 0.9, 2.0]],
            np.float32,
        )
        out = trk.update(dets, img)
    assert out.shape[0] == 2
    assert len(set(out.id.astype(int))) == 2
    assert set(out.cls.astype(int)) == {0, 2}


def test_compute_fps_mask():
    from boxmot_tpu.data.mot import compute_fps_mask

    frames = np.arange(1, 31)
    m = compute_fps_mask(frames, 30, 10)
    assert frames[m].tolist() == [1, 4, 7, 10, 13, 16, 19, 22, 25, 28]
    assert compute_fps_mask(frames, 30, 60).all()  # target above original
    assert compute_fps_mask(np.zeros(0), 30, 10).shape == (0,)


def _write_mp4(path, n_frames=12, wh=(64, 48)):
    cv2 = pytest.importorskip("cv2")
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, wh)
    assert wr.isOpened()
    for i in range(n_frames):
        wr.write(np.full((wh[1], wh[0], 3), i * 20, np.uint8))
    wr.release()


def test_iter_source_video_cv2(tmp_path):
    """Video decoding rides cv2.VideoCapture (the backend that ships here;
    imageio has no ffmpeg plugin in this environment)."""
    from boxmot_tpu.data.loaders import iter_source

    vid = tmp_path / "clip.mp4"
    _write_mp4(vid)
    frames = list(iter_source(vid))
    assert len(frames) == 12
    ident, img = frames[0]
    assert ident == vid
    assert img.shape == (48, 64, 3) and img.dtype == np.uint8
    assert len(list(iter_source(vid, vid_stride=2))) == 6


def test_boxmot_track_over_video(tmp_path):
    """Boxmot.track on a video source unpacks (ident, frame) pairs
    (regression: the facade used to pass the tuple as the image)."""
    from boxmot_tpu.api import Boxmot

    vid = tmp_path / "clip.mp4"
    _write_mp4(vid, n_frames=5)
    results = Boxmot(tracker="bytetrack").track(source=vid)
    assert len(results) == 5


def test_cli_track_over_video(tmp_path, monkeypatch):
    """cli track accepts a video source: frames stream through
    iter_source and a live detector feeds the tracker."""
    from click.testing import CliRunner

    import boxmot_tpu.detectors.registry as registry
    from boxmot_tpu.detectors.base import BaseDetectorBackend, Detections
    from boxmot_tpu.engine import cli as cli_mod

    class StubDetector(BaseDetectorBackend):
        def __init__(self, *a, **k):
            super().__init__(weights=None)

        def preprocess(self, img):
            return img, None

        def process(self, batch):
            return batch

        def postprocess(self, raw, meta) -> Detections:
            dets = np.array([[10, 10, 40, 44, 0.9, 0.0]], np.float32)
            return Detections(xyxy=dets[:, :4], conf=dets[:, 4], cls=dets[:, 5])

    monkeypatch.setattr(registry, "create_detector", lambda *a, **k: StubDetector())

    vid = tmp_path / "clip.mp4"
    _write_mp4(vid, n_frames=6)
    out_txt = tmp_path / "clip_tracks.txt"
    res = CliRunner().invoke(
        cli_mod.cli,
        ["track", "--source", str(vid), "--detector", "stub.pt",
         "--save-txt", str(out_txt)],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    rows = np.loadtxt(out_txt, delimiter=",", ndmin=2)
    assert rows.shape[1] == 9
    assert set(rows[:, 0].astype(int)) <= set(range(1, 7)) and len(rows)
