"""Preflight dataset validator (tools/validate_dataset.py).

The real-data parity runbook (docs/USAGE.md) starts with this validator;
these tests prove it passes on byte-real fixture layouts and catches the
failure classes it claims to (missing files, undecodable video, absent
frame explosion)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import validate_dataset  # noqa: E402

from gem_fixture import build_gem_fixture  # noqa: E402
from test_dreyeve_dataset import build_dreyeve_fixture  # noqa: E402


@pytest.fixture(scope="module")
def gem_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gem_validate")
    build_gem_fixture(root, duration_s=6.0)
    return root


@pytest.fixture(scope="module")
def dreyeve_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dreyeve_validate")
    build_dreyeve_fixture(root, duration_s=4.0)
    return root


def _run(args, capsys):
    rc = validate_dataset.main(args)
    out = json.loads(capsys.readouterr().out)
    return rc, out


class TestGEMValidator:
    def test_fixture_passes_shallow_and_deep(self, gem_root, capsys):
        rc, out = _run(["gem", str(gem_root), "--split", "001", "--deep"],
                       capsys)
        assert rc == 0, out
        assert out["ok"] and not out["problems"]
        # deep check actually counted GPS points
        assert any("GPMF GPS points" in n for n in out["notes"])

    def test_missing_gaze_detected(self, gem_root, capsys, tmp_path):
        import shutil

        broken = tmp_path / "broken"
        shutil.copytree(gem_root, broken)
        (broken / "02EyeTracker" / "001" / "gaze.pldata").unlink()
        rc, out = _run(["gem", str(broken), "--split", "001"], capsys)
        assert rc == 1
        assert any("gaze.pldata" in p for p in out["problems"])

    def test_missing_root_subdir(self, tmp_path, capsys):
        (tmp_path / "01GoPro").mkdir()
        rc, out = _run(["gem", str(tmp_path), "--split", "001"], capsys)
        assert rc == 1
        assert any("02EyeTracker" in p for p in out["problems"])

    def test_unmatched_gps_stem_detected(self, gem_root, capsys, tmp_path):
        import shutil

        broken = tmp_path / "badgps"
        shutil.copytree(gem_root, broken)
        gps_dir = broken / "03CorrectedGPS" / "001"
        for c in gps_dir.glob("*.csv"):
            c.rename(gps_dir / f"ZZZZ{c.name}")
        rc, out = _run(["gem", str(broken), "--split", "001"], capsys)
        assert rc == 1
        assert any("stem-match" in p for p in out["problems"])


class TestDreyeveValidator:
    def test_fixture_passes(self, dreyeve_root, capsys):
        rc, out = _run(["dreyeve", str(dreyeve_root), "--deep"], capsys)
        assert rc == 0, out
        assert out["ok"]

    def test_missing_speed_file_detected(self, dreyeve_root, capsys,
                                         tmp_path):
        import shutil

        broken = tmp_path / "broken_d"
        shutil.copytree(dreyeve_root, broken)
        (broken / "01" / "speed_course_coord.txt").unlink()
        rc, out = _run(["dreyeve", str(broken)], capsys)
        assert rc == 1
        assert any("speed_course_coord" in p for p in out["problems"])

    def test_avi_only_session_notes_build_frames(self, tmp_path, capsys):
        base = tmp_path / "01"
        base.mkdir(parents=True)
        (base / "etg_samples.txt").write_text("x")
        (base / "speed_course_coord.txt").write_text("x")
        (base / "video_garmin.avi").write_bytes(b"\x00")
        (base / "video_etg.avi").write_bytes(b"\x00")
        rc, out = _run(["dreyeve", str(tmp_path)], capsys)
        assert rc == 0
        assert any("build_frames" in n for n in out["notes"])

    def test_no_sessions(self, tmp_path, capsys):
        rc, out = _run(["dreyeve", str(tmp_path)], capsys)
        assert rc == 1


class TestEnvFallback:
    def test_env_var_root(self, gem_root, capsys, monkeypatch):
        monkeypatch.setenv("ROUTEFORMER_DATASET_DIR", str(gem_root))
        rc, out = _run(["gem", "--split", "001"], capsys)
        assert rc == 0, out

    def test_no_root_no_env(self, capsys, monkeypatch):
        monkeypatch.delenv("ROUTEFORMER_DATASET_DIR", raising=False)
        rc, out = _run(["gem"], capsys)
        assert rc == 1
