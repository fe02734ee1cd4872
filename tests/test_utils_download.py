"""Download/extract utilities + RequirementsChecker — offline tests."""

import tarfile
import zipfile

import pytest

from boxmot_tpu.utils import checks, download


def _file_url(path):
    return path.resolve().as_uri()


class TestDownloadFile:
    def test_file_url_roundtrip(self, tmp_path):
        src = tmp_path / "src.bin"
        src.write_bytes(b"hello world" * 100)
        dest = tmp_path / "out" / "dst.bin"
        got = download.download_file(_file_url(src), dest)
        assert got == dest
        assert dest.read_bytes() == src.read_bytes()

    def test_existing_kept_without_overwrite(self, tmp_path):
        src = tmp_path / "src.bin"
        src.write_bytes(b"new")
        dest = tmp_path / "dst.bin"
        dest.write_bytes(b"old")
        download.download_file(_file_url(src), dest)
        assert dest.read_bytes() == b"old"
        download.download_file(_file_url(src), dest, overwrite=True)
        assert dest.read_bytes() == b"new"

    def test_progress_callback(self, tmp_path):
        src = tmp_path / "src.bin"
        src.write_bytes(b"x" * 1000)
        seen = []
        download.download_file(
            _file_url(src),
            tmp_path / "dst.bin",
            progress=lambda done, total: seen.append(done),
        )
        assert seen and seen[-1] == 1000

    def test_missing_raises_after_retries(self, tmp_path):
        with pytest.raises(IOError, match="failed to download"):
            download.download_file(
                _file_url(tmp_path / "nope.bin"),
                tmp_path / "dst.bin",
                retries=1,
                backoff_factor=0.0,
            )

    def test_parallel(self, tmp_path):
        jobs = []
        for i in range(5):
            src = tmp_path / f"s{i}.bin"
            src.write_bytes(bytes([i]) * 10)
            jobs.append((_file_url(src), tmp_path / "out" / f"d{i}.bin"))
        dests = download.download_files_parallel(jobs, max_workers=3)
        assert [d.read_bytes()[0] for d in dests] == list(range(5))

    def test_parallel_propagates_failure(self, tmp_path):
        src = tmp_path / "ok.bin"
        src.write_bytes(b"ok")
        jobs = [
            (_file_url(src), tmp_path / "a.bin"),
            (_file_url(tmp_path / "missing.bin"), tmp_path / "b.bin"),
        ]
        with pytest.raises(IOError):
            download.download_files_parallel(jobs, retries=0)


class TestExtract:
    def test_zip_roundtrip(self, tmp_path):
        z = tmp_path / "a.zip"
        with zipfile.ZipFile(z, "w") as f:
            f.writestr("d/x.txt", "one")
            f.writestr("y.txt", "two")
        seen = []
        out = download.extract_zip(z, tmp_path / "out", progress=lambda a, b: seen.append((a, b)))
        assert (out / "d" / "x.txt").read_text() == "one"
        assert seen[-1] == (2, 2)

    def test_zip_traversal_rejected(self, tmp_path):
        z = tmp_path / "evil.zip"
        with zipfile.ZipFile(z, "w") as f:
            f.writestr("../evil.txt", "boom")
        with pytest.raises(ValueError, match="unsafe"):
            download.extract_zip(z, tmp_path / "out")

    def test_tar_roundtrip(self, tmp_path):
        src = tmp_path / "payload.txt"
        src.write_text("data")
        t = tmp_path / "a.tar.gz"
        with tarfile.open(t, "w:gz") as f:
            f.add(src, arcname="sub/payload.txt")
        out = download.extract_tar(t, tmp_path / "out")
        assert (out / "sub" / "payload.txt").read_text() == "data"

    def test_download_and_extract_zip(self, tmp_path):
        z = tmp_path / "a.zip"
        with zipfile.ZipFile(z, "w") as f:
            f.writestr("inner.txt", "zzz")
        out = download.download_and_extract(_file_url(z), tmp_path / "dest")
        assert (out / "inner.txt").read_text() == "zzz"


class TestChecks:
    def test_requirement_satisfied(self):
        assert checks.requirement_satisfied("numpy")
        assert checks.requirement_satisfied("numpy>=1.20")
        assert not checks.requirement_satisfied("surely-not-a-package-xyz")

    def test_import_alias(self):
        # PyYAML is present under import name yaml
        assert checks.requirement_satisfied("pyyaml")

    def test_missing_requirements(self):
        out = checks.missing_requirements(["numpy", "surely-not-a-package-xyz"])
        assert out == ["surely-not-a-package-xyz"]

    def test_checker_raises_actionable(self):
        rc = checks.RequirementsChecker()
        rc.check_packages(["numpy"])  # no-op
        with pytest.raises(ModuleNotFoundError, match="pip install"):
            rc.check_packages(["surely-not-a-package-xyz"], purpose="testing")

    def test_sync_extra_names_extra(self):
        rc = checks.RequirementsChecker()
        with pytest.raises(ModuleNotFoundError, match=r"\[export\]"):
            rc.sync_extra("export", ["surely-not-a-package-xyz"])
