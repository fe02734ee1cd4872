"""Per-mode workflow reporters (utils/reporters.py).

Covers the role the reference's rich subsystem plays
(boxmot/utils/rich/reporters/* + workflow/{steps,fields,reporting}.py):
summary cards, step composition, live panel rendering, trial feed,
and headless degradation.
"""

from __future__ import annotations

from io import StringIO

import numpy as np
import pytest

from boxmot_tpu.utils import reporters as rep
from boxmot_tpu.utils.rich_ui import WorkflowProgress


def _console(width=120):
    from rich.console import Console

    return Console(file=StringIO(), force_terminal=True, width=width)


class TestSteps:
    def test_eval_steps_optional_stages(self):
        assert rep.eval_steps() == [rep.SETUP, rep.TRACK, rep.EVALUATE]
        assert rep.POSTPROCESS in rep.eval_steps(postprocess=True)
        assert rep.GENERATE in rep.eval_steps(generate=True)
        # optional stages keep pipeline order
        full = rep.eval_steps(postprocess=True, generate=True)
        assert full.index(rep.GENERATE) < full.index(rep.TRACK) < full.index(
            rep.POSTPROCESS) < full.index(rep.EVALUATE)

    def test_mode_step_lists(self):
        assert rep.TRACK_STEPS[0] == rep.SETUP
        assert rep.RESEARCH_STEPS == [rep.PREPARE, rep.BASELINE, rep.PROPOSE, rep.BEST]


class TestFields:
    def test_compact_model_name(self):
        assert rep.compact_model_name("/a/b/osnet_x0_25.pt") == "osnet_x0_25"
        assert rep.compact_model_name(["m.tflite", "x"]) == "m"
        assert rep.compact_model_name("plain") == "plain"

    def test_card_drops_empty_values(self):
        c = rep.card("T", [("a", 1), ("b", None), ("c", "")])
        assert c == ("T", [("a", 1)])
        assert rep.card("T", [("a", None)]) is None

    def test_reporter_fields_compact(self):
        r = rep.EvalReporter(benchmark="mot17-mini", tracker="bytetrack:cpp",
                             n_workers=1)
        cards = [c for c in r.fields() if c is not None]
        titles = [t for t, _ in cards]
        assert "Dataset" in titles and "Tracker" in titles
        # n_workers=1 is the default and must not clutter the card
        replay = dict(cards)["Replay"] if "Replay" in dict(cards) else []
        assert all(k != "Workers" for k, _ in replay)


class TestPanelRendering:
    def test_cards_and_steps_rendered(self):
        console = _console()
        r = rep.EvalReporter(benchmark="mot17-mini", data="/d", tracker="ocsort")
        with r.start(force_rich=True, console=console) as wp:
            wp.start_step(rep.SETUP)
            wp.finish_step(rep.SETUP)
            wp.start_step(rep.TRACK)
            wp.advance("sequences", 1, 2)
            wp.finish_step(rep.TRACK)
        out = console.file.getvalue()
        assert "mot17-mini" in out and "ocsort" in out
        assert rep.TRACK in out and "1/2" in out

    def test_exception_marks_running_step_failed(self):
        console = _console()
        r = rep.TrackReporter(tracker="bytetrack", source="/s")
        with pytest.raises(RuntimeError):
            with r.start(force_rich=True, console=console) as wp:
                wp.start_step(rep.SETUP)
                raise RuntimeError("boom")
        assert wp.pipeline[rep.SETUP].state == "failed"

    def test_headless_start_works_without_tty(self):
        r = rep.GenerateReporter(data="/d", cache_root="/c", preprocess="resize")
        with r.start(force_rich=False) as wp:
            wp.start_step(rep.SETUP)
            wp.finish_step(rep.SETUP)
            wp.start_step(rep.GENERATE)
            wp.advance("seq", 1, 1)
            wp.finish_step(rep.GENERATE)
        assert wp.pipeline[rep.GENERATE].state == "done"

    def test_extra_renderable_in_panel(self):
        console = _console()
        feed = rep.TrialFeed()
        feed.record({"params": {"a": 1}, "metrics": {"HOTA": 0.5},
                     "score": 0.5, "error": None, "seconds": 1.0})
        r = rep.TuneReporter(data="/d", tracker="bytetrack", backend="tpe",
                             n_trials=3, work_dir="/w")
        with r.start(force_rich=True, console=console) as wp:
            wp.start_step(rep.OPTIMIZE)
            wp.extra = feed.renderable()
            wp.refresh()
            wp.finish_step(rep.OPTIMIZE)
        out = console.file.getvalue()
        assert "trials (1)" in out and "a=1" in out


class TestTrialFeed:
    def test_best_tracking_and_failures(self):
        feed = rep.TrialFeed()
        t1 = {"params": {}, "metrics": {"HOTA": 0.4}, "score": 0.4,
              "error": None, "seconds": 1}
        t2 = {"params": {}, "metrics": {}, "score": float("-inf"),
              "error": "exploded", "seconds": 1}
        t3 = {"params": {}, "metrics": {"HOTA": 0.6}, "score": 0.6,
              "error": None, "seconds": 1}
        for t in (t1, t2, t3):
            feed.record(t)
        assert feed.best is t3
        assert "failed" in feed.log_line(t2)
        assert "*best*" in feed.log_line(t3)

    def test_renderable_caps_rows(self):
        feed = rep.TrialFeed(keep=3)
        for i in range(10):
            feed.record({"params": {"i": i}, "metrics": {"HOTA": i / 10},
                         "score": i / 10, "error": None, "seconds": 0.1})
        table = feed.renderable()
        assert table.row_count == 3


class TestArtifactsTable:
    def test_rendered_paths(self):
        console = _console()
        rep.artifacts_table({"Best config": "/w/best.yaml"}, console=console)
        out = console.file.getvalue()
        assert "best.yaml" in out


class TestTunerCallback:
    def test_trial_callback_fires_per_trial(self, tmp_path):
        from boxmot_tpu.engine.tuning.tuner import Tuner

        calls = []
        tuner = Tuner(
            "assets/MOT17-mini/train", "bytetrack",
            work_dir=tmp_path, seed=0,
            trial_callback=calls.append,
        )
        # don't run real evals: stub the evaluator
        tuner._evaluate = lambda params: {"HOTA": 0.5, "MOTA": 0.5, "IDF1": 0.5}
        tuner.fit(n_trials=3)
        assert len(calls) == 3
        assert all("score" in c for c in calls)


class TestEvalProgressHook:
    def test_run_eval_reports_sequence_progress(self, tmp_path):
        from boxmot_tpu.engine.eval import run_eval

        seen = []
        run_eval(
            "assets/MOT17-mini/train", "bytetrack:cpp",
            output_dir=tmp_path,
            progress=lambda name, done, total: seen.append((name, done, total)),
        )
        assert len(seen) == 2
        assert seen[-1][1] == seen[-1][2] == 2


class TestResearchPhaseCallback:
    def test_phases_fire(self, tmp_path):
        from boxmot_tpu.engine.research import ResearchRunner

        stages = []
        runner = ResearchRunner(
            "assets/MOT17-mini/train", "bytetrack", work_dir=tmp_path, seed=0,
        )
        runner._evaluate = lambda params: {"HOTA": 0.5, "MOTA": 0.5, "IDF1": 0.5}
        runner.phase_callback = lambda stage, done, total: stages.append(
            (stage, done, total))
        runner.run(n_candidates=2)
        assert stages[0][0] == "baseline"
        assert ("candidates", 2, 2) in stages
