"""End-to-end OBB benchmark eval on the mmot-mini fixture."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.data.mmot import MmotDataset, MmotSequence, corners_to_xywha
from boxmot_tpu.engine.eval_obb import run_eval_obb, track_sequence_obb

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "mmot-mini" / "train"


class TestMmotData:
    def test_dataset_indexing(self):
        ds = MmotDataset(FIXTURE)
        assert len(ds) == 2
        names = [s.name for s in ds]
        assert names == ["data23-1", "data24-1"]

    def test_sequence_gt_and_frames(self):
        seq = MmotSequence(FIXTURE, "data23-1")
        gt = seq.gt
        assert gt.shape[1] == 13
        assert seq.seq_length == 6
        assert len(seq.img_paths) == 6
        frame = np.load(seq.img_paths[0])
        assert frame.dtype == np.uint8 and frame.ndim == 3

    def test_corners_roundtrip(self):
        from boxmot_tpu.engine.metrics.mot_metrics import obb_to_corners

        rng = np.random.default_rng(0)
        xywha = np.column_stack(
            [
                rng.uniform(50, 300, 16),
                rng.uniform(50, 300, 16),
                rng.uniform(10, 60, 16),
                rng.uniform(10, 60, 16),
                rng.uniform(-np.pi / 2, np.pi / 2, 16),
            ]
        ).astype(np.float32)
        back = corners_to_xywha(obb_to_corners(xywha))
        # same rectangle up to w/h swap + 90deg angle shift: compare areas
        # and centers, and the rotated IoU must be ~1
        np.testing.assert_allclose(back[:, :2], xywha[:, :2], atol=1e-2)
        np.testing.assert_allclose(
            back[:, 2] * back[:, 3], xywha[:, 2] * xywha[:, 3], rtol=1e-3
        )
        from boxmot_tpu.engine.metrics.mot_metrics import _rotated_iou_polys

        ious = _rotated_iou_polys(
            obb_to_corners(xywha), obb_to_corners(back)
        ).diagonal()
        assert (ious > 0.99).all()

    def test_gt_as_obb_dets(self):
        seq = MmotSequence(FIXTURE, "data24-1")
        dets = seq.gt_as_obb_dets()
        assert len(dets) == 6
        for d in dets:
            assert d.shape[1] == 7
            assert (d[:, 5] > 0.9).all()  # conf
            assert (d[:, 2] > 0).all() and (d[:, 3] > 0).all()  # w, h


class TestObbEval:
    def test_track_sequence_writes_corner_rows(self):
        from boxmot_tpu.engine.eval import build_replay_config

        seq = MmotSequence(FIXTURE, "data23-1")
        cfg = build_replay_config("bytetrack", is_obb=True, capacity=64)
        rows = track_sequence_obb(cfg, seq.gt_as_obb_dets())
        assert rows.shape[1] == 13
        assert rows[:, 0].min() >= 1 and rows[:, 0].max() <= 6
        assert len(set(rows[:, 1])) > 5  # multiple identities

    def test_run_eval_obb_class_averaged(self, tmp_path):
        res = run_eval_obb(
            FIXTURE, "bytetrack", output_dir=tmp_path, per_class=True
        )
        c = res["combined"]
        assert 0.3 < c["HOTA"] < 1.0
        assert res["per_class"]
        # the dominant class (cars) tracks nearly perfectly from gt dets
        best = max(m["HOTA"] for m in res["per_class"].values())
        assert best > 0.75
        assert (tmp_path / "data23-1.txt").exists()

    def test_run_eval_obb_pooled(self):
        res = run_eval_obb(FIXTURE, "bytetrack", per_class=False)
        assert 0.3 < res["combined"]["HOTA"] <= 1.0

    def test_missing_root_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            run_eval_obb(tmp_path, "bytetrack")
