"""bench.py parent harness: the engine-by-engine child fallback must
survive a dying fast path, keep RETRYING through a tunnel outage on its
time budget, and report honest failure only when nothing ran inside it.
(The measurement itself needs a TPU; these tests cover the isolation and
retry logic with stubbed subprocesses and a fake clock.)"""

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
    monkeypatch.delenv("RAYFINDER_BENCH_BUDGET_S", raising=False)
    spec = importlib.util.spec_from_file_location("bench_under_test", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeClock:
    """Deterministic stand-in for time.time/time.sleep so the parent's
    retry budget elapses instantly in tests."""

    def __init__(self):
        self.t = 0.0

    def time(self):
        return self.t

    def sleep(self, s):
        self.t += s


@pytest.fixture()
def clock(bench, monkeypatch):
    c = FakeClock()
    monkeypatch.setattr(bench.time, "time", c.time)
    monkeypatch.setattr(bench.time, "sleep", c.sleep)
    return c


def _completed(stdout: str, rc: int = 0):
    return subprocess.CompletedProcess(args=[], returncode=rc, stdout=stdout, stderr="")


def test_parent_relays_first_successful_child(bench, clock, monkeypatch, capsys):
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


def test_parent_falls_back_when_fast_path_dies(bench, clock, monkeypatch, capsys):
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
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [line]
    assert calls == ["pallas", "wavefront"]


def test_parent_retries_through_outage_until_recovery(bench, clock, monkeypatch, capsys):
    """The round-1 failure mode: one failed probe must NOT zero the round.
    The tunnel comes back after ~20 minutes of fake time; the parent's
    budget (60 min) must still produce a real measurement."""
    line = json.dumps({"metric": "duck_800x600_4bounce_path_trace",
                       "value": 50.3, "unit": "Mrays/s/chip", "vs_baseline": 0.2515})

    def probe(timeout_s=300.0):
        if clock.t < 1200.0:
            clock.sleep(timeout_s)  # a dead tunnel eats the probe timeout
            return False
        return True

    monkeypatch.setattr(bench, "_probe_device", probe)
    monkeypatch.setattr(bench.subprocess, "run", lambda cmd, **kw: _completed(line + "\n"))
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [line]
    assert clock.t >= 1200.0  # it actually waited out the outage


def test_parent_reports_zero_when_tunnel_stays_dead(bench, clock, monkeypatch, capsys):
    probes = []

    def probe(timeout_s=300.0):
        probes.append(clock.t)
        clock.sleep(timeout_s)
        return False

    monkeypatch.setattr(bench, "_probe_device", probe)
    bench._parent()
    out = capsys.readouterr().out.strip()
    data = json.loads(out)
    assert data["value"] == 0.0 and data["vs_baseline"] == 0.0
    assert len(probes) > 3  # kept re-probing across the whole budget
    assert clock.t >= 3600.0


def test_parent_prints_exactly_one_json_line_on_timeout(bench, clock, monkeypatch, capsys):
    def fake_run(cmd, **kw):
        clock.sleep(kw.get("timeout", 600.0))
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    monkeypatch.setattr(bench, "_probe_device", lambda **kw: True)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 0.0
