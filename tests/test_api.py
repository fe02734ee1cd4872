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


class TestFacadeParity:
    """The reference Boxmot client exposes 8 workflow verbs
    (api/client.py:70-551); assert full surface parity."""

    def test_all_eight_verbs_exist(self):
        from boxmot_tpu.api import Boxmot

        for verb in ("track", "generate", "val", "tune", "research",
                     "export", "train", "eval_reid"):
            assert callable(getattr(Boxmot(), verb)), verb

    def test_tune_verb_runs(self, tmp_path):
        from boxmot_tpu.api import Boxmot

        best = Boxmot(tracker="bytetrack").tune(
            data=FIXTURE, n_trials=2, work_dir=tmp_path, backend="random"
        )
        assert best["metrics"]["HOTA"] > 0.3

    def test_export_verb_checkpoint(self, tmp_path):
        from boxmot_tpu.api import Boxmot

        out = Boxmot(reid="osnet_x0_25").export(
            include=("checkpoint",), out_dir=tmp_path, hw=(64, 32)
        )
        assert out["checkpoint"]["path"].exists()

    def test_eval_reid_verb(self):
        from pathlib import Path as _P

        from boxmot_tpu.api import Boxmot

        reid_fixture = _P(__file__).parent.parent / "assets" / "reid-mini" / "Market-1501-v15.09.15"
        res = Boxmot(reid="osnet_x0_25").eval_reid(data=reid_fixture.parent)
        assert 0.0 <= res["mAP"] <= 1.0

    def test_train_verb_resolves_weights_path(self, tmp_path, monkeypatch):
        # a reid weights PATH must resolve to its backbone name, not be
        # passed verbatim as the model id
        from boxmot_tpu import api as api_mod
        from boxmot_tpu.api import Boxmot

        captured = {}

        class FakeTrainer:
            step = 0

            def __init__(self, cfg):
                captured["model"] = cfg.model

            def fit(self):
                return [{"step": 0, "loss": 0.0}]

        monkeypatch.setattr(
            "boxmot_tpu.reid.training.trainer.ReIDTrainer", FakeTrainer
        )
        weights = tmp_path / "osnet_x0_25_market.pt"
        weights.write_bytes(b"stub")
        Boxmot(reid=str(weights)).train(data=tmp_path, steps=1)
        assert captured["model"] == "osnet_x0_25"
