"""utils.misc: path/CLI/device helpers (reference boxmot/utils/misc.py +
torch_utils.py surface)."""

import numpy as np
import pytest

from boxmot_tpu.utils.misc import (
    get_system_info,
    increment_path,
    parse_imgsz,
    prompt_overwrite,
    resolve_model_path,
    select_device,
)


class TestParseImgsz:
    def test_passthrough(self):
        assert parse_imgsz(None) is None
        assert parse_imgsz(640) == 640

    def test_strings(self):
        assert parse_imgsz("640") == 640
        assert parse_imgsz("640,480") == (640, 480)
        assert parse_imgsz("640 480") == (640, 480)

    def test_sequences(self):
        assert parse_imgsz([320]) == 320
        assert parse_imgsz((320, 256)) == (320, 256)

    def test_invalid(self):
        with pytest.raises(ValueError):
            parse_imgsz("1,2,3")
        with pytest.raises(ValueError):
            parse_imgsz("abc")


class TestIncrementPath:
    def test_fresh_path_unchanged(self, tmp_path):
        p = tmp_path / "exp"
        assert increment_path(p) == p

    def test_increments_dirs(self, tmp_path):
        p = tmp_path / "exp"
        p.mkdir()
        assert increment_path(p) == tmp_path / "exp2"
        (tmp_path / "exp2").mkdir()
        assert increment_path(p) == tmp_path / "exp3"

    def test_exist_ok(self, tmp_path):
        p = tmp_path / "exp"
        p.mkdir()
        assert increment_path(p, exist_ok=True) == p

    def test_files_keep_suffix(self, tmp_path):
        f = tmp_path / "out.txt"
        f.write_text("x")
        assert increment_path(f) == tmp_path / "out2.txt"

    def test_mkdir(self, tmp_path):
        p = increment_path(tmp_path / "runs" / "exp", mkdir=True)
        assert p.is_dir()


class TestResolveModelPath:
    def test_existing_explicit_path(self, tmp_path):
        w = tmp_path / "model.pt"
        w.write_bytes(b"")
        assert resolve_model_path(w) == w

    def test_bare_name_falls_back_to_weights_dir(self, tmp_path):
        (tmp_path / "osnet.pt").write_bytes(b"")
        assert resolve_model_path("osnet.pt", default_dir=tmp_path) == tmp_path / "osnet.pt"

    def test_case_insensitive_sibling(self, tmp_path):
        (tmp_path / "Model.PT").write_bytes(b"")
        got = resolve_model_path(tmp_path / "model.pt")
        assert got.name == "Model.PT"

    def test_missing_returns_last_candidate(self, tmp_path):
        got = resolve_model_path("nope.pt", default_dir=tmp_path)
        assert got == tmp_path / "nope.pt"


def test_prompt_overwrite_noninteractive(tmp_path):
    f = tmp_path / "cache.npy"
    f.write_bytes(b"")
    assert prompt_overwrite("cache", f, ci=True) is False


def test_get_system_info_reports_jax():
    info = get_system_info()
    assert info["n_devices"] >= 1
    assert info["backend"] in ("cpu", "tpu", "axon")


def test_select_device():
    import jax

    assert select_device("") is jax.devices()[0]
    assert select_device("cpu").platform == "cpu"
    assert select_device("cpu:1").platform == "cpu"  # x8 virtual mesh in tests
    with pytest.raises(ValueError):
        select_device("cuda")
    with pytest.raises(ValueError):
        select_device("cpu:99")


def test_track_project_run_dirs(tmp_path):
    """cli track --project writes MOT txt into incremented run dirs."""
    from pathlib import Path

    from click.testing import CliRunner

    from boxmot_tpu.engine.cli import cli

    seq = Path(__file__).resolve().parent.parent / "assets" / "MOT17-mini" / "train"
    seq = sorted(p for p in seq.iterdir() if (p / "img1").is_dir())[0]
    runner = CliRunner()
    for expected in ("exp", "exp2"):
        res = runner.invoke(
            cli,
            ["track", "--source", str(seq), "--project", str(tmp_path / "runs")],
            catch_exceptions=False,
        )
        assert res.exit_code == 0, res.output
        out = tmp_path / "runs" / expected / f"{seq.name}.txt"
        assert out.exists(), res.output
        assert np.loadtxt(out, delimiter=",", ndmin=2).shape[1] == 9
