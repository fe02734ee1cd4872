"""Tests for metric plots and the rich workflow UI."""

import numpy as np
import pytest

from boxmot_tpu.engine.plots import (
    CATEGORICAL,
    plot_eval_summary,
    plot_fps_metric,
    plot_metric_bars,
    plot_metric_radar,
)
from boxmot_tpu.utils.rich_ui import (
    PipelineTracker,
    WorkflowProgress,
    metrics_table,
    render_pipeline,
    rich_available,
)

RESULTS = {
    f"tracker{i}": {
        "HOTA": 0.60 + 0.02 * i,
        "MOTA": 0.70 + 0.01 * i,
        "IDF1": 0.75 - 0.01 * i,
        "DetA": 0.65,
        "AssA_mean": 0.62,
        "fps": 100.0 * (i + 1),
    }
    for i in range(10)
}


class TestPlots:
    def test_palette_is_fixed_order(self):
        assert len(CATEGORICAL) == 8
        assert len(set(CATEGORICAL)) == 8

    def test_radar_written_and_caps_series(self, tmp_path):
        out = plot_metric_radar(RESULTS, tmp_path / "radar.png")
        assert out.exists() and out.stat().st_size > 1000

    def test_bars_written(self, tmp_path):
        out = plot_metric_bars(RESULTS, tmp_path / "bars.png")
        assert out.exists() and out.stat().st_size > 1000

    def test_fps_scatter_written(self, tmp_path):
        out = plot_fps_metric(RESULTS, tmp_path / "fps.png")
        assert out.exists() and out.stat().st_size > 1000

    def test_summary_writes_both(self, tmp_path):
        paths = plot_eval_summary(RESULTS, tmp_path)
        assert len(paths) == 2 and all(p.exists() for p in paths)

    def test_percent_passthrough(self, tmp_path):
        # values already in percent must not be rescaled
        res = {"t": {"HOTA": 67.7, "MOTA": 78.0, "IDF1": 79.2,
                     "DetA": 65.0, "AssA_mean": 60.0}}
        out = plot_metric_bars(res, tmp_path / "pct.png")
        assert out.exists()


class TestPipelineTracker:
    def test_state_machine(self):
        p = PipelineTracker(["generate", "replay", "metrics"])
        assert all(s.state == "pending" for s in p.steps)
        p.start("generate", "2 seqs")
        assert p.current.name == "generate"
        p.finish("generate")
        p.start("replay")
        p.finish("replay", "failed", detail="boom")
        rows = p.summary_rows()
        assert [r["state"] for r in rows] == ["done", "failed", "pending"]
        assert rows[1]["detail"] == "boom"
        assert rows[0]["seconds"] >= 0.0

    def test_invalid_terminal_state(self):
        p = PipelineTracker(["a"])
        with pytest.raises(ValueError):
            p.finish("a", "exploded")

    def test_render_headless(self):
        p = PipelineTracker(["a", "b"])
        p.start("a")
        table = render_pipeline(p)
        if rich_available():
            assert table is not None


@pytest.mark.skipif(not rich_available(), reason="rich not installed")
class TestRichRendering:
    def test_metrics_table_renders(self):
        from rich.console import Console

        console = Console(record=True, width=100)
        metrics_table(RESULTS, console=console, title="test")
        text = console.export_text()
        assert "tracker0" in text and "HOTA" in text
        # fraction metrics render as percentages
        assert "60.00" in text

    def test_workflow_progress_forced(self):
        with WorkflowProgress(["gen", "track"], force_rich=True) as wp:
            wp.start_step("gen")
            wp.advance("MOT17-02", 5, 10)
            wp.advance("MOT17-02", 10, 10)
            wp.finish_step("gen")
            wp.start_step("track")
            wp.finish_step("track", "skipped")
        states = [s.state for s in wp.pipeline.steps]
        assert states == ["done", "skipped"]

    def test_workflow_progress_headless(self):
        with WorkflowProgress(["gen"], force_rich=False) as wp:
            wp.start_step("gen")
            wp.advance("seq", 1, 2)
            wp.finish_step("gen")
        assert wp.pipeline["gen"].state == "done"


class TestBuildCommand:
    def test_build_reports_environment(self):
        from click.testing import CliRunner

        from boxmot_tpu.engine.cli import cli

        result = CliRunner().invoke(cli, ["build"])
        assert result.exit_code == 0, result.output
        assert "jax backend:" in result.output


class TestWorkflowResults:
    """Typed result wrappers (reference workflows/results.py role)."""

    def test_validation_result_dual_access(self):
        from boxmot_tpu.engine.results import ValidationResult

        r = ValidationResult(
            {"combined": {"HOTA": 0.65, "MOTA": 0.50, "IDF1": 0.67},
             "per_seq": {}}
        )
        assert r.hota == r["combined"]["HOTA"]
        assert "HOTA 65.00" in r.summary()

    def test_generate_result_totals(self):
        from boxmot_tpu.engine.results import GenerateResult

        g = GenerateResult({"a": {"dets": 3, "embs": 2}, "b": {"dets": 4, "embs": 0}})
        assert g.total_dets == 7 and g.total_embs == 2
        assert "7 detections" in g.summary()

    def test_tune_and_export_results(self):
        from boxmot_tpu.engine.results import ExportResult, TuneResult

        t = TuneResult({"score": 1.5, "params": {"x": 1}, "metrics": {"HOTA": 0.6}})
        assert "HOTA 60.00" in t.summary() and t.score == 1.5
        e = ExportResult({"tflite": {"path": "m.tflite"}})
        assert "tflite->m.tflite" in e.summary()

    def test_missing_attr_raises(self):
        from boxmot_tpu.engine.results import WorkflowResult

        with pytest.raises(AttributeError):
            WorkflowResult({}).nope

    def test_train_research_trial_results(self):
        from boxmot_tpu.engine.results import (
            ResearchResult,
            TrainResult,
            TuneTrialResult,
        )

        tr = TrainResult(
            steps=100, final_loss=1.25, weights_path="ckpts",
            history=[{"step": 50, "loss": 2.0}, {"step": 100, "loss": 1.25}],
        )
        assert tr.steps == 100 and tr.history[-1]["loss"] == 1.25
        assert "100 steps" in tr.summary() and "1.2500" in tr.summary()

        trial = TuneTrialResult(
            index=3, params={"a": 1}, metrics={"HOTA": 0.61}, score=1.2,
            error=None,
        )
        assert trial.ok and trial.config == {"a": 1}
        assert "trial 3" in trial.summary() and "HOTA 61.00" in trial.summary()

        rr = ResearchResult(
            baseline={"metrics": {"HOTA": 0.60, "MOTA": 0.70}},
            best={"metrics": {"HOTA": 0.63, "MOTA": 0.69}},
            n_evaluated=5, n_failed=1,
        )
        assert abs(rr.delta_summary["HOTA"] - 0.03) < 1e-9
        assert "5 candidates (1 failed)" in rr.summary()
        assert "dHOTA +3.00" in rr.summary()

    def test_result_types_importable_from_package_root(self):
        """Reference surface parity: `from boxmot import TuneResult` etc.
        (reference boxmot/__init__.py:14-27)."""
        import boxmot_tpu

        for name in (
            "ValidationResult", "GenerateResult", "TuneResult",
            "TuneTrialResult", "ExportResult", "TrackRunResult",
            "TrainResult", "ResearchResult",
        ):
            assert isinstance(getattr(boxmot_tpu, name), type), name
