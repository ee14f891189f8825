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


DUCK_LINE = json.dumps({"metric": "duck_800x600_4bounce_path_trace",
                        "value": 30.0, "unit": "Mrays/s/chip",
                        "vs_baseline": 0.15})
COURT_LINE = json.dumps({"metric": "courtyard_512x512_4bounce_path_trace",
                         "value": 3.5, "unit": "Mrays/s/chip",
                         "time_to_1024spp_1080p_s": 2400.0})


def test_parent_relays_first_successful_child(bench, clock, monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        env = kw.get("env", {})
        calls.append((env.get("RAYFINDER_BENCH_CHILD"),
                      env.get("RAYFINDER_ENGINE")))
        if env.get("RAYFINDER_BENCH_CHILD") == "courtyard":
            return _completed(COURT_LINE + "\n")
        return _completed("warmup noise\n" + DUCK_LINE + "\n")

    monkeypatch.setattr(bench, "_probe_device", lambda **kw: True)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # the driver contract: exactly ONE JSON line
    data = json.loads(out[0])
    # Duck fields intact (driver continuity) + courtyard (primary metric)
    # folded into the same line.
    assert data["metric"] == "duck_800x600_4bounce_path_trace"
    assert data["value"] == 30.0 and data["vs_baseline"] == 0.15
    assert data["courtyard_mrays"] == 3.5
    assert data["time_to_1024spp_1080p_s"] == 2400.0
    assert calls == [("1", "pallas"), ("courtyard", None)]


def test_parent_falls_back_when_fast_path_dies(bench, clock, monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        env = kw.get("env", {})
        eng = env.get("RAYFINDER_ENGINE")
        if env.get("RAYFINDER_BENCH_CHILD") == "courtyard":
            return _completed(COURT_LINE + "\n")
        calls.append(eng)
        if eng == "pallas":
            return _completed("TPU worker crashed\n", rc=1)
        return _completed(DUCK_LINE + "\n")

    monkeypatch.setattr(bench, "_probe_device", lambda **kw: True)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    data = json.loads(out[0])
    assert data["value"] == 30.0
    assert data["courtyard_mrays"] == 3.5
    assert calls == ["pallas", "wavefront"]


def test_parent_zero_courtyard_when_its_child_dies(bench, clock, monkeypatch, capsys):
    """A courtyard-child fault must not cost the Duck measurement: the
    line still carries the Duck number with courtyard_mrays 0.0."""

    def fake_run(cmd, **kw):
        env = kw.get("env", {})
        if env.get("RAYFINDER_BENCH_CHILD") == "courtyard":
            return _completed("TPU worker crashed\n", rc=1)
        return _completed(DUCK_LINE + "\n")

    monkeypatch.setattr(bench, "_probe_device", lambda **kw: True)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    data = json.loads(out[0])
    assert data["value"] == 30.0
    assert data["courtyard_mrays"] == 0.0


def test_parent_retries_through_outage_until_recovery(bench, clock, monkeypatch, capsys):
    """The round-1 failure mode: one failed probe must NOT zero the round.
    The tunnel comes back after ~20 minutes of fake time; the parent's
    budget (60 min) must still produce a real measurement."""

    def probe(timeout_s=300.0):
        if clock.t < 1200.0:
            clock.sleep(timeout_s)  # a dead tunnel eats the probe timeout
            return False
        return True

    def fake_run(cmd, **kw):
        env = kw.get("env", {})
        if env.get("RAYFINDER_BENCH_CHILD") == "courtyard":
            return _completed(COURT_LINE + "\n")
        return _completed(DUCK_LINE + "\n")

    monkeypatch.setattr(bench, "_probe_device", probe)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench._parent()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 30.0
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
