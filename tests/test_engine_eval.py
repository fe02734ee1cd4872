"""End-to-end eval pipeline on the MOT17-mini fixture."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.data.mot import MOTDataset
from boxmot_tpu.engine.eval import run_eval
from boxmot_tpu.engine.mot_io import convert_to_mot_format, read_mot_results, write_mot_results
from boxmot_tpu.engine.replay import replay_sequence
from boxmot_tpu.trackers.bytetrack import ByteTrack, ByteTrackConfig

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"


def test_dataset_indexing():
    ds = MOTDataset(FIXTURE)
    assert len(ds) == 2
    names = [s.name for s in ds]
    assert "MOT17-02-FRCNN" in names and "MOT17-04-FRCNN" in names
    seq = ds.sequences[0]
    assert seq.seq_length > 0
    gt = seq.gt()
    assert gt.shape[1] >= 9
    dets = seq.dets_per_frame()
    assert len(dets) == seq.seq_length
    assert all(d.shape[1] == 6 for d in dets)


def test_mot_io_roundtrip(tmp_path):
    rows = np.array(
        [[10.0, 20.0, 50.0, 100.0, 3, 0.9, 0.0, 1], [5, 5, 25, 45, 4, 0.8, 2.0, 0]],
        np.float32,
    )
    mot = convert_to_mot_format(rows, frame_idx=7)
    assert mot.shape == (2, 9)
    assert mot[0][0] == 7 and mot[0][1] == 3
    np.testing.assert_allclose(mot[0][2:6], [10, 20, 40, 80])
    assert mot[0][7] == 1  # cls + 1
    path = tmp_path / "out.txt"
    write_mot_results(path, mot)
    back = read_mot_results(path)
    np.testing.assert_allclose(back[:, :6], mot[:, :6])


def test_scan_replay_equals_host_loop():
    """The lax.scan replay must produce the same tracks as per-frame update."""
    ds = MOTDataset(FIXTURE)
    seq = ds.sequences[0]
    dets = seq.dets_per_frame()[:40]
    cfg = ByteTrackConfig()

    rows_scan = replay_sequence(cfg, dets)

    trk = ByteTrack()
    img = np.zeros((seq.info.im_height, seq.info.im_width, 3), np.uint8)
    rows_loop = []
    for f, d in enumerate(dets):
        out = np.asarray(trk.update(d, img))
        if len(out):
            rows_loop.append(convert_to_mot_format(out, f + 1))
    rows_loop = (
        np.concatenate(rows_loop, axis=0) if rows_loop else np.empty((0, 9), np.float32)
    )

    assert rows_scan.shape == rows_loop.shape
    # Same frame/id pairs
    key_scan = {(int(r[0]), int(r[1])) for r in rows_scan}
    key_loop = {(int(r[0]), int(r[1])) for r in rows_loop}
    assert key_scan == key_loop
    # Same geometry
    s = rows_scan[np.lexsort((rows_scan[:, 1], rows_scan[:, 0]))]
    l = rows_loop[np.lexsort((rows_loop[:, 1], rows_loop[:, 0]))]
    np.testing.assert_allclose(s[:, 2:6], l[:, 2:6], atol=1.0)


def test_run_eval_mot17_mini(tmp_path):
    res = run_eval(FIXTURE, "bytetrack", output_dir=tmp_path)
    c = res["combined"]
    # Exact pins (deterministic pipeline; full per-tracker table in
    # tests/test_pinned_metrics.py) — metric regressions fail loudly.
    assert abs(c["HOTA"] - 0.649859) <= 1e-4, c
    assert abs(c["MOTA"] - 0.495283) <= 1e-4, c
    assert abs(c["IDF1"] - 0.662461) <= 1e-4, c
    assert (tmp_path / "MOT17-02-FRCNN.txt").exists()
    assert len(res["per_seq"]) == 2


def test_run_eval_gt_as_dets_near_perfect(tmp_path):
    """Feeding ground truth boxes as detections must give near-perfect HOTA."""
    import boxmot_tpu.engine.eval as ev
    from boxmot_tpu.engine.metrics.mot_metrics import (
        evaluate_sequences,
        preprocess_sequence,
    )
    from boxmot_tpu.engine.replay import replay_sequence

    ds = MOTDataset(FIXTURE)
    seq_data = {}
    for seq in ds:
        gt = seq.gt()
        # Only pedestrian, considered entries as fake perfect detections.
        keep = (gt[:, 6] != 0) & (gt[:, 7] == 1)
        rows = gt[keep]
        per_frame = seq.dets_per_frame(
            source=np.column_stack([rows[:, :6], np.ones(len(rows))])
        )
        mot_rows = replay_sequence(ByteTrackConfig(track_thresh=0.4), per_frame)
        seq_data[seq.name] = preprocess_sequence(
            gt, mot_rows.astype(np.float64), seq.seq_length
        )
    res = evaluate_sequences(seq_data)
    c = res["combined"]
    assert c["HOTA"] > 0.85, c
    assert c["MOTA"] > 0.9, c
    assert c["IDF1"] > 0.9, c


def test_all_eight_benchmark_configs_resolve():
    """Full parity with the reference's 7+1 benchmark YAMLs."""
    from boxmot_tpu.configs.benchmark import (
        available_benchmarks,
        load_benchmark,
        resolve_split_dir,
    )

    names = available_benchmarks()
    for expected in ("dancetrack", "mmot", "mmot-mini", "mot17",
                     "mot17-mini", "mot20", "sportsmot", "visdrone"):
        assert expected in names
    for name in names:
        cfg = load_benchmark(name)
        assert cfg["id"] == name
        assert cfg["dataset"]["box_type"] in ("aabb", "obb")
        assert cfg["dataset"]["default_split"] in cfg["dataset"]["splits"]
        resolve_split_dir(cfg)  # path math never raises
        assert all(isinstance(k, int) for k in cfg["dataset"]["classes"])
