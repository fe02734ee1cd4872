"""Research loop: proposer, preflight, scoring, resume."""

from pathlib import Path

import numpy as np
import pytest

from boxmot_tpu.engine.research.runner import (
    ResearchRunner,
    default_objective,
    mutation_proposer,
    run_research,
)
from boxmot_tpu.configs import load_tracker_config

FIXTURE = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"


def test_objective_penalizes_regressions():
    base = {"HOTA": 0.6, "IDF1": 0.6, "MOTA": 0.6}
    better = {"HOTA": 0.65, "IDF1": 0.61, "MOTA": 0.61}
    worse_idf1 = {"HOTA": 0.65, "IDF1": 0.5, "MOTA": 0.61}
    assert default_objective(better, base) > 0
    assert default_objective(worse_idf1, base) < default_objective(better, base)


def test_mutation_proposer_stays_in_bounds():
    specs = load_tracker_config("bytetrack")
    propose = mutation_proposer(specs)
    rng = np.random.default_rng(0)
    for _ in range(20):
        params = propose([], rng)
        for k, spec in specs.items():
            if spec["type"] in ("uniform", "loguniform"):
                lo, hi = spec["range"]
                assert lo <= params[k] <= hi


def test_preflight_rejects_broken_candidate():
    runner = ResearchRunner(FIXTURE, "bytetrack")
    with pytest.raises(Exception):
        runner.preflight({"track_thresh": "garbage"})


def test_research_end_to_end(tmp_path):
    best = run_research(
        FIXTURE, "bytetrack", n_candidates=3, work_dir=tmp_path, seed=0
    )
    assert "params" in best and "metrics" in best
    assert (tmp_path / "research.json").exists()
    # resume continues from persisted history
    runner = ResearchRunner(FIXTURE, "bytetrack", work_dir=tmp_path)
    assert len(runner.history) == 3
    best2 = runner.run(n_candidates=3)
    assert best2["score"] == best["score"]
