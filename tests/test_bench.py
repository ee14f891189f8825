"""bench.py parent harness: the engine-by-engine child fallback must
survive a dying fast path and report honest failure when nothing runs.
(The measurement itself needs a TPU; these tests cover the isolation
logic with stubbed subprocesses.)"""

import importlib.util
import json
import pathlib
import subprocess
import sys

import pytest

BENCH = pathlib.Path(__file__).parent.parent / "bench.py"


@pytest.fixture()
def bench(monkeypatch):
    monkeypatch.delenv("RAYFINDER_ENGINE", raising=False)
    monkeypatch.delenv("RAYFINDER_BENCH_CHILD", raising=False)
    spec = importlib.util.spec_from_file_location("bench_under_test", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _completed(stdout: str, rc: int = 0):
    return subprocess.CompletedProcess(args=[], returncode=rc, stdout=stdout, stderr="")


def test_parent_relays_first_successful_child(bench, monkeypatch, capsys):
    line = json.dumps({"metric": "duck_800x600_4bounce_path_trace",
                       "value": 30.0, "unit": "Mrays/s/chip", "vs_baseline": 0.15})
    calls = []

    def fake_run(cmd, **kw):
        calls.append(kw.get("env", {}).get("RAYFINDER_ENGINE"))
        return _completed("warmup noise\n" + line + "\n")

    monkeypatch.setattr(bench, "_probe_device", lambda **kw: True)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [line]
    assert calls == ["pallas"]  # first engine succeeded; no fallback


def test_parent_falls_back_when_fast_path_dies(bench, monkeypatch, capsys):
    line = json.dumps({"metric": "duck_800x600_4bounce_path_trace",
                       "value": 12.0, "unit": "Mrays/s/chip", "vs_baseline": 0.06})
    calls = []

    def fake_run(cmd, **kw):
        eng = kw.get("env", {}).get("RAYFINDER_ENGINE")
        calls.append(eng)
        if eng == "pallas":
            return _completed("TPU worker crashed\n", rc=1)
        return _completed(line + "\n")

    monkeypatch.setattr(bench, "_probe_device", lambda **kw: True)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [line]
    assert calls == ["pallas", "wavefront"]


def test_parent_reports_zero_when_tunnel_dead(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_device", lambda **kw: False)
    bench._parent()
    out = capsys.readouterr().out.strip()
    data = json.loads(out)
    assert data["value"] == 0.0 and data["vs_baseline"] == 0.0


def test_parent_prints_exactly_one_json_line_on_timeout(bench, monkeypatch, capsys):
    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    monkeypatch.setattr(bench, "_probe_device", lambda **kw: True)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 0.0
