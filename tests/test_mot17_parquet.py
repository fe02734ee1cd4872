"""MOT17 parquet bootstrap: tree materialization, ablation renumbering,
det npy caches, and end-to-end eval over the generated tree."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from boxmot_tpu.data.mot import MOTDataset
from boxmot_tpu.data.mot17_parquet import ablation_start, setup_mot17_from_parquet

SEQ_LEN = 10  # ablation: frames 7..10 renumbered 1..4


def _make_snapshot(root: Path) -> Path:
    """Synthetic local parquet snapshot for two tiny sequences."""
    rng = np.random.default_rng(0)
    (root / "data" / "seqinfo").mkdir(parents=True)
    pd.DataFrame(
        {
            "sequence": ["MOT17-91", "MOT17-92"],
            "split": ["train", "train"],
            "seq_length": [SEQ_LEN, SEQ_LEN],
            "fps": [30, 25],
            "width": [64, 64],
            "height": [48, 48],
        }
    ).to_parquet(root / "data" / "seqinfo" / "seqinfo.parquet")

    frames = np.repeat(np.arange(1, SEQ_LEN + 1), 2)
    n = len(frames)

    def boxes():
        return {
            "bbox_left": rng.uniform(0, 30, n).round(1),
            "bbox_top": rng.uniform(0, 20, n).round(1),
            "bbox_width": rng.uniform(5, 15, n).round(1),
            "bbox_height": rng.uniform(8, 20, n).round(1),
        }

    gt_rows = []
    det_rows = []
    for seq in ("MOT17-91", "MOT17-92"):
        gt_rows.append(
            pd.DataFrame(
                {
                    "sequence": seq,
                    "frame": frames,
                    "track_id": np.tile([1, 2], SEQ_LEN),
                    **boxes(),
                    "conf": 1,
                    "class_id": 1,
                    "visibility": 1.0,
                }
            )
        )
        det_rows.append(
            pd.DataFrame(
                {"sequence": seq, "frame": frames, **boxes(), "score": 0.9}
            )
        )
    (root / "data" / "gt").mkdir(parents=True)
    pd.concat(gt_rows).to_parquet(root / "data" / "gt" / "train-00000-of-00001.parquet")
    det_dir = root / "data" / "detections" / "frcnn"
    det_dir.mkdir(parents=True)
    pd.concat(det_rows).to_parquet(det_dir / "train-00000-of-00001.parquet")

    for seq in ("MOT17-91", "MOT17-92"):
        img_dir = root / "images" / "train" / seq / "img1"
        img_dir.mkdir(parents=True)
        for f in range(1, SEQ_LEN + 1):
            Image.fromarray(
                np.full((48, 64, 3), f * 20, np.uint8)
            ).save(img_dir / f"{f:06d}.jpg")
    return root


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    return _make_snapshot(tmp_path_factory.mktemp("snap"))


class TestSetup:
    def test_ablation_start_convention(self):
        assert ablation_start(10) == 7
        assert ablation_start(600) == 302  # MOT17-02 convention

    def test_train_split_full_tree(self, snapshot, tmp_path):
        dest = tmp_path / "mot17"
        split_dir = setup_mot17_from_parquet(
            dest, split="train", parquet_root=snapshot
        )
        seq_dir = split_dir / "MOT17-91-FRCNN"
        assert (seq_dir / "seqinfo.ini").exists()
        assert (seq_dir / "gt" / "gt.txt").exists()
        assert (seq_dir / "det" / "det.txt").exists()
        assert len(list((seq_dir / "img1").glob("*.jpg"))) == SEQ_LEN
        info = (seq_dir / "seqinfo.ini").read_text()
        assert "seqLength=10" in info and "frameRate=30" in info
        # idempotent: marker short-circuits
        assert setup_mot17_from_parquet(
            dest, split="train", parquet_root=snapshot
        ) == split_dir

    def test_ablation_renumbering(self, snapshot, tmp_path):
        dest = tmp_path / "mot17"
        split_dir = setup_mot17_from_parquet(
            dest, split="ablation", parquet_root=snapshot
        )
        seq_dir = split_dir / "MOT17-92-FRCNN"
        imgs = sorted((seq_dir / "img1").glob("*.jpg"))
        assert [p.name for p in imgs] == [f"{i:06d}.jpg" for i in range(1, 5)]
        # symlinked to original frames 7..10
        assert imgs[0].resolve().name == "000007.jpg"
        gt = np.loadtxt(seq_dir / "gt" / "gt.txt", delimiter=",")
        assert gt[:, 0].min() == 1 and gt[:, 0].max() == 4
        assert "seqLength=4" in (seq_dir / "seqinfo.ini").read_text()

    def test_det_npy_cache_layout(self, snapshot, tmp_path):
        dest = tmp_path / "mot17"
        cache = tmp_path / "cache"
        setup_mot17_from_parquet(
            dest, split="ablation", parquet_root=snapshot, cache_root=cache
        )
        npy = cache / "mot17_public_frcnn" / "dets" / "MOT17-91-FRCNN.npy"
        arr = np.load(npy)
        assert arr.shape[1] == 7
        assert arr[:, 0].min() == 1 and arr[:, 0].max() == 4
        # xyxy: x2 > x1, y2 > y1
        assert (arr[:, 3] > arr[:, 1]).all() and (arr[:, 4] > arr[:, 2]).all()
        assert (arr[:, 6] == 0).all()

    def test_generated_tree_loads_and_evaluates(self, snapshot, tmp_path):
        from boxmot_tpu.engine.eval import run_eval

        split_dir = setup_mot17_from_parquet(
            tmp_path / "mot17", split="ablation", parquet_root=snapshot
        )
        ds = MOTDataset(split_dir)
        assert len(ds) == 2
        res = run_eval(split_dir, "bytetrack")
        assert "HOTA" in res["combined"]

    def test_unknown_detector_rejected(self, snapshot, tmp_path):
        with pytest.raises(ValueError):
            setup_mot17_from_parquet(
                tmp_path / "x", detector="YOLO", parquet_root=snapshot
            )

    def test_missing_snapshot_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            setup_mot17_from_parquet(tmp_path / "y", parquet_root=tmp_path / "nope")
