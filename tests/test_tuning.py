"""Tuning: search-space sampling + end-to-end random search on the fixture."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.configs import flatten_config, get_tracker_defaults, load_tracker_config
from boxmot_tpu.engine.tuning.tuner import Tuner, run_tune, sample_config, sample_param

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"


def test_config_defaults_construct_trackers():
    from boxmot_tpu.trackers.zoo import TRACKER_MAPPING, create_tracker

    for name in TRACKER_MAPPING:
        defaults = get_tracker_defaults(name)
        trk = create_tracker(name, tracker_config=defaults)
        assert trk is not None


def test_sampling_respects_spec():
    rng = np.random.default_rng(0)
    assert 0.1 <= sample_param({"type": "uniform", "range": [0.1, 0.2]}, rng) <= 0.2
    v = sample_param({"type": "qrandint", "range": [10, 61, 10]}, rng)
    assert v in range(10, 61, 10)
    v = sample_param({"type": "choice", "options": [1, 2, 3]}, rng)
    assert v in (1, 2, 3)
    lo = sample_param({"type": "loguniform", "range": [1e-4, 1.0]}, rng)
    assert 1e-4 <= lo <= 1.0
    with pytest.raises(ValueError):
        sample_param({"type": "bogus"}, rng)


def test_sample_config_from_yaml():
    specs = load_tracker_config("bytetrack")
    rng = np.random.default_rng(1)
    cfg = sample_config(specs, rng)
    assert set(cfg) == set(specs)
    defaults = flatten_config(specs)
    assert defaults["track_thresh"] == 0.45


def test_tuner_end_to_end(tmp_path):
    best = run_tune(
        FIXTURE, "bytetrack", n_trials=4, work_dir=tmp_path, seed=0
    )
    assert best["metrics"]["HOTA"] > 0.3
    assert (tmp_path / "trials.json").exists()
    assert (tmp_path / "best.yaml").exists()
    # resume: no new work needed, same best
    t = Tuner(FIXTURE, "bytetrack", work_dir=tmp_path)
    assert len(t.trials) == 4
    best2 = t.fit(n_trials=4)
    assert best2["score"] == best["score"]


class TestModeDefaults:
    def test_mode_defaults_merge(self):
        from boxmot_tpu.configs import get_mode_defaults

        d = get_mode_defaults("eval")
        assert d["tracker"] == "bytetrack"  # runtime tier
        assert d["reid"] == "osnet_x0_25"  # shared tier
        assert d["min_det_conf"] == 0.0  # mode tier

    def test_build_mode_namespace_overrides(self):
        from boxmot_tpu.configs import build_mode_namespace

        ns = build_mode_namespace("track", {"tracker": "occluboost"})
        assert ns.mode == "track" and ns.tracker == "occluboost"
        assert ns.show_timing is False  # untouched default

    def test_unknown_mode(self):
        import pytest

        from boxmot_tpu.configs import get_mode_defaults

        with pytest.raises(ValueError, match="unknown mode"):
            get_mode_defaults("deploy")
