"""Top-level Boxmot API facade."""

from pathlib import Path

import numpy as np
import pytest

import boxmot_tpu

FIXTURE = Path(__file__).parent.parent / "assets" / "MOT17-mini" / "train"
SEQ = FIXTURE / "MOT17-02-FRCNN"


def test_track_workflow(tmp_path):
    bm = boxmot_tpu.Boxmot(tracker="bytetrack")
    out_txt = tmp_path / "out.txt"
    res = bm.track(source=SEQ, save_txt=out_txt)
    assert len(res) == 4  # fixture frames
    assert len(res[-1]) > 0
    rows = np.loadtxt(out_txt, delimiter=",", ndmin=2)
    assert rows.shape[1] == 9 and rows[:, 0].max() == 4


def test_val_workflow():
    bm = boxmot_tpu.Boxmot(tracker="bytetrack")
    rep = bm.val(data=FIXTURE)
    assert 0.0 < rep["combined"]["HOTA"] <= 1.0
    assert "MOT17-02-FRCNN" in rep["per_seq"]


def test_functional_and_spec_dict():
    res = boxmot_tpu.track(SEQ, tracker="sfsort")
    assert len(res) == 4
    bm = boxmot_tpu.Boxmot(tracker={"name": "bytetrack", "config": {"track_thresh": 0.7}})
    trk = bm._make_tracker()
    assert trk.cfg.track_thresh == 0.7


def test_unknown_tracker_raises():
    bm = boxmot_tpu.Boxmot(tracker="sorttrack9000")
    with pytest.raises((KeyError, ValueError)):
        bm.track(source=SEQ)
