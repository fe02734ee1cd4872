"""DetectorReIDPipeline: staged timing, autobatch, failure containment.

Reference counterpart: boxmot/engine/tracking/inference.py:40-388.
"""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.detectors.base import BaseDetectorBackend, Detections
from boxmot_tpu.engine.inference import DetectorReIDPipeline


class StubDetector(BaseDetectorBackend):
    def __init__(self, fail_on: int = -1):
        super().__init__(weights=None)
        self.calls = 0
        self.fail_on = fail_on

    def preprocess(self, img):
        return img, img.shape[:2]

    def process(self, batch):
        self.calls += 1
        if self.calls == self.fail_on:
            raise RuntimeError("synthetic detector crash")
        return batch

    def postprocess(self, raw, meta) -> Detections:
        dets = np.array(
            [[10, 10, 50, 90, 0.9, 0.0], [60, 20, 120, 130, 0.8, 0.0],
             [200, 40, 260, 160, 0.7, 0.0]],
            np.float32,
        )
        return Detections(xyxy=dets[:, :4], conf=dets[:, 4], cls=dets[:, 5])


class StubReID:
    feature_dim = 4

    def __init__(self):
        self.batch_sizes = []

    def get_features(self, boxes, img):
        self.batch_sizes.append(len(boxes))
        return np.asarray(boxes, np.float32)[:, :4] / 100.0


def test_pipeline_produces_dets_and_embs():
    pipe = DetectorReIDPipeline(StubDetector(), reid=StubReID())
    img = np.zeros((240, 320, 3), np.uint8)
    dets, embs, result = pipe(img)
    assert dets.shape == (3, 6)
    assert embs.shape == (3, 4)
    assert isinstance(result, Detections)
    # staged timing recorded
    summary = pipe.timing.summary()
    for key in ("det_preprocess", "det_process", "det_postprocess", "reid"):
        assert key in summary


def test_pipeline_autobatches_reid_crops():
    reid = StubReID()
    pipe = DetectorReIDPipeline(StubDetector(), reid=reid, batch_size=2)
    img = np.zeros((240, 320, 3), np.uint8)
    dets, embs, _ = pipe(img)
    assert embs.shape == (3, 4)
    assert reid.batch_sizes == [2, 1]  # 3 crops in batches of 2


def test_pipeline_contains_frame_failures():
    pipe = DetectorReIDPipeline(StubDetector(fail_on=2), reid=StubReID())
    img = np.zeros((240, 320, 3), np.uint8)
    ok_dets, _, _ = pipe(img)
    assert len(ok_dets) == 3
    bad_dets, bad_embs, bad_result = pipe(img)  # crashing frame -> empty
    assert bad_dets.shape == (0, 6) and bad_embs is None and bad_result is None
    assert pipe.failed_frames == 1
    again, _, _ = pipe(img)  # stream continues
    assert len(again) == 3
    # strict mode propagates
    strict = DetectorReIDPipeline(StubDetector(fail_on=1), skip_frame_errors=False)
    with pytest.raises(RuntimeError, match="synthetic"):
        strict(img)


def test_track_cli_live_detector(tmp_path):
    """End-to-end: track --detector with a real (random-weight) yolox
    checkpoint over the MOT17-mini frames drives detector inference +
    tracker update live."""
    import jax
    import jax.numpy as jnp
    import torch
    from click.testing import CliRunner

    from boxmot_tpu.engine.cli import cli
    from boxmot_tpu.models.yolox import build_yolox, export_yolox

    model = build_yolox("yolox_nano", num_classes=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {
        f"model.{k}": torch.from_numpy(v.copy())
        for k, v in export_yolox(variables, "yolox_nano").items()
    }
    weights = tmp_path / "yolox_nano.pth"
    torch.save({"model": sd}, weights)

    src = (
        Path(__file__).resolve().parent.parent
        / "assets" / "MOT17-mini" / "train" / "MOT17-02-FRCNN"
    )
    out_txt = tmp_path / "out.txt"
    runner = CliRunner()
    res = runner.invoke(
        cli,
        ["track", "--source", str(src), "--tracker", "bytetrack",
         "--detector", str(weights), "--save-txt", str(out_txt)],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert out_txt.exists()
