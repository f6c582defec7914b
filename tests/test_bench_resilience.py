"""Crash-proof bench artifact plumbing (VERDICT r4 item 1).

Rounds 2 and 4 both produced rc=124 driver artifacts with NO JSON line —
round 4's measured moves/s was literally discarded when a later stage's TPU
fault killed the process. These tests pin the new guarantees:

- every stage persists its result the moment it completes;
- a device fault mid-run still emits the best-known partial JSON with the
  already-measured stages' data (the VERDICT's done-criterion: inject a fake
  ``JaxRuntimeError`` after stage 1, assert the JSON line still emerges with
  stage-1 data);
- a re-exec'd process skips completed stages instead of re-measuring them;
- SIGTERM (the driver's ``timeout``) emits the partial JSON and exits 0.
"""

import io
import json
import os
import signal
import subprocess
import sys
import textwrap
import time
from contextlib import redirect_stdout

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class FakeJaxRuntimeError(Exception):
    pass


# give the fake the name the bench's device-fault classifier matches
FakeJaxRuntimeError.__name__ = "JaxRuntimeError"


@pytest.fixture
def bench(monkeypatch, tmp_path):
    """Import bench with an isolated scratch file and no re-exec."""
    sys.path.insert(0, REPO)
    import bench as bench_mod

    scratch = str(tmp_path / "scratch.json")
    monkeypatch.setattr(bench_mod, "_SCRATCH", scratch)
    monkeypatch.setattr(bench_mod, "_emitted", False)
    # never re-exec inside the test process
    monkeypatch.setenv("BENCH_ATTEMPT", "3")
    return bench_mod


def _fake_stages(bench, fail_at=None, calls=None):
    def make(name):
        def fn(det, dists, on_cpu, hb):
            if calls is not None:
                calls.append(name)
            if name == fail_at:
                raise FakeJaxRuntimeError("ABORTED: TPU backend error")
            if name == "jax":
                return {"moves_per_sec": 12345678.0, "runs_min_max": [1, 2],
                        "runs_rel_spread": 0.01, "spread_ok": True}
            return {f"{name}_metric": 1.0}

        return fn

    return tuple((n, make(n)) for n, _ in bench._STAGES)


def test_fault_after_stage1_still_emits_stage1_data(bench, monkeypatch):
    calls = []
    monkeypatch.setattr(
        bench, "_STAGES", _fake_stages(bench, fail_at="cnn", calls=calls)
    )
    out = io.StringIO()
    with redirect_stdout(out):
        bench._run_benchmarks(None, None, on_cpu=False)
    line = [l for l in out.getvalue().splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    # the already-measured stage-1 number survives the stage-2 crash
    assert result["metric"] == "rjmcmc_moves_per_sec"
    assert result["value"] == 12345678.0
    assert result["extra"]["complete"] is False
    assert "jax" in result["extra"]["stages_done"]
    assert "baseline_fallback" in result["extra"]
    assert result["vs_baseline"] > 0
    assert calls == ["jax", "cnn"]


def test_reexec_skips_completed_stages(bench, monkeypatch):
    # first pass: dies at "scene"
    calls1 = []
    monkeypatch.setattr(
        bench, "_STAGES", _fake_stages(bench, fail_at="scene", calls=calls1)
    )
    with redirect_stdout(io.StringIO()):
        bench._run_benchmarks(None, None, on_cpu=False)
    assert calls1 == ["jax", "cnn", "scene"]

    # "re-exec": fresh emission state, same scratch — completed stages skip
    monkeypatch.setattr(bench, "_emitted", False)
    calls2 = []
    monkeypatch.setattr(
        bench, "_STAGES", _fake_stages(bench, fail_at=None, calls=calls2)
    )
    out = io.StringIO()
    with redirect_stdout(out):
        bench._run_benchmarks(None, None, on_cpu=False)
    assert calls2 == ["scene", "scene_batched", "superstep", "baseline"]
    line = [l for l in out.getvalue().splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["extra"]["complete"] is True
    assert result["value"] == 12345678.0  # stage-1 data from the first pass
    assert sorted(result["extra"]["stages_done"]) == sorted(
        n for n, _ in bench._STAGES
    )


def test_programming_error_still_emits(bench, monkeypatch):
    stages = _fake_stages(bench, fail_at=None)

    def boom(det, dists, on_cpu, hb):
        raise ValueError("not a device fault")

    monkeypatch.setattr(bench, "_STAGES", (stages[0], ("cnn", boom)))
    out = io.StringIO()
    with redirect_stdout(out):
        bench._run_benchmarks(None, None, on_cpu=False)
    result = json.loads(
        [l for l in out.getvalue().splitlines() if l.startswith("{")][-1]
    )
    assert result["value"] == 12345678.0
    assert result["extra"]["complete"] is False


def test_sigterm_emits_partial_json_and_exits_zero(tmp_path):
    """Driver kills bench via `timeout` (SIGTERM): must emit and exit 0."""
    script = textwrap.dedent("""
        import json, os, sys, time
        sys.path.insert(0, %r)
        import bench
        bench._install_emergency_emitters()
        bench._save_stage("jax", {"moves_per_sec": 777.0})
        print("READY", flush=True)
        time.sleep(60)
    """ % REPO)
    env = dict(
        os.environ,
        BENCH_SCRATCH=str(tmp_path / "s.json"),
        BENCH_T0=repr(time.time()),
        BENCH_DEADLINE_S="3600",
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    assert proc.stdout.readline().strip() == "READY"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 0
    result = json.loads(
        [l for l in out.splitlines() if l.startswith("{")][-1]
    )
    assert result["value"] == 777.0
    assert result["extra"]["complete"] is False


def test_deadline_emits_partial_json(tmp_path):
    """A nearly-expired deadline emits the best-known JSON within seconds."""
    script = textwrap.dedent("""
        import json, os, sys, time
        sys.path.insert(0, %r)
        import bench
        bench._save_stage("jax", {"moves_per_sec": 888.0})
        bench._install_emergency_emitters()
        time.sleep(60)
    """ % REPO)
    env = dict(
        os.environ,
        BENCH_SCRATCH=str(tmp_path / "s.json"),
        BENCH_T0=repr(time.time()),
        BENCH_DEADLINE_S="31",  # _deadline_watch fires when remaining <= 30
    )
    out = subprocess.run(
        [sys.executable, "-c", script], env=env, cwd=REPO, timeout=45,
        capture_output=True, text=True,
    )
    assert out.returncode == 0
    result = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert result["value"] == 888.0
    assert result["extra"]["complete"] is False


def test_watchdog_disarmed_after_fatal_return(bench, monkeypatch):
    """The hang watchdog must die when _run_benchmarks exits via the
    fatal-error path — a surviving daemon thread execve's its HOST process
    into bench.py 900 s later (observed live: a pytest process running
    this suite was replaced mid-run)."""
    import threading
    import time as _time

    monkeypatch.setattr(
        bench, "_STAGES", _fake_stages(bench, fail_at="jax")
    )
    with redirect_stdout(io.StringIO()):
        bench._run_benchmarks(None, None, on_cpu=False)
    deadline = _time.time() + 10.0
    while _time.time() < deadline:
        if not any(t.name == "bench-watchdog" and t.is_alive()
                   for t in threading.enumerate()):
            return
        _time.sleep(0.5)
    raise AssertionError("bench-watchdog thread survived _run_benchmarks")
