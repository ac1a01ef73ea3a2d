"""bench.py must be un-losable: every emitted line is valid JSON with the
primary detect metric, stage stderr never reaches stdout, and partial
stage results survive a budget kill (round-3 regression: BENCH_r03.json
rc=124 / parsed=null because one hung stage forfeited every metric)."""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_always_valid_json(capsys, tmp_path, monkeypatch):
    bench = _load_bench()
    # NEVER write the real logs/ from a test: an unpatched run of this
    # test fabricated logs/bench_last_good.json with the 219.5 fixture
    # below, which masqueraded as a banked round-4 TPU measurement
    monkeypatch.setattr(bench, "LOGS", str(tmp_path / "logs"))
    # empty results (nothing measured yet) must still be a full schema
    bench._emit({})
    line = capsys.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(line)
    assert obj["metric"] == "e2e_1080p_detect_fps_per_chip"
    assert obj["value"] == 0.0 and obj["vs_baseline"] == 0.0

    # partial results: detect landed, e2e timed out (None)
    bench._emit({"detect": {"fps": 219.5, "per_batch": {"32": 200.0}},
                 "e2e": None,
                 "_status": {"e2e": {"s": 700.0, "status": "timeout"}}})
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 219.5
    assert obj["vs_baseline"] == pytest.approx(219.5 / bench.BASELINE_FPS,
                                               abs=0.01)
    assert obj["stages"]["e2e"]["status"] == "timeout"


def test_emit_error_field(capsys, tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "LOGS", str(tmp_path / "logs"))
    bench._emit({"_error": "tpu_unavailable"})
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["error"] == "tpu_unavailable"


def test_run_stage_timeout_keeps_partial_result(tmp_path, monkeypatch):
    """A stage killed at its budget leaves whatever it already wrote."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "LOGS", str(tmp_path / "logs"))
    monkeypatch.setattr(bench, "CACHE", str(tmp_path / "cache"))

    # fake stage binary: writes a partial result, then hangs forever
    fake = tmp_path / "fake_stage.py"
    fake.write_text(
        "import json, sys, time\n"
        "out = sys.argv[sys.argv.index('--out') + 1]\n"
        "json.dump({'fps': 42.0}, open(out, 'w'))\n"
        "time.sleep(600)\n")
    monkeypatch.setattr(bench.os.path, "abspath", lambda p: str(fake))

    # budget must exceed interpreter startup: the axon sitecustomize makes
    # bare `python -c pass` cost ~5 s on a cold VM, so a too-tight budget
    # kills the child before it writes anything (seen 2026-08-18)
    results = {}
    got = bench._run_stage("detect", budget=20.0, results=results)
    assert got == {"fps": 42.0}
    assert results["_status"]["detect"]["status"] == "timeout"


def test_parent_stdout_is_json_only():
    """Under a dead/absent TPU the orchestrator must emit a parseable
    error line quickly; stdout must contain ONLY JSON lines. Uses a tiny
    budget so probe/prep can't run long (cache is already warm in CI
    only if bench ran; either way every stdout line must parse)."""
    env = dict(os.environ, HOCKEY_BENCH_BUDGET="1",
               HOCKEY_BENCH_LOGS="/tmp/bench_test_logs")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    assert lines, "bench printed nothing"
    for ln in lines:
        obj = json.loads(ln)  # every line valid JSON
        assert "metric" in obj
