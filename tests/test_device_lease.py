"""Device-lease (yield-flag) protocol: the axon TPU chip is exclusive to one
process, so high-priority work (the driver's bench) asks long-running stages
to exit at their next checkpoint boundary and resume afterwards.

Host-side mechanics only — no device involved.
"""

import os
import time

import pytest

from mpp_cnn_rs_object_detection_tpu.utils import config as cfg


@pytest.fixture()
def flag_path(tmp_path, monkeypatch):
    p = str(tmp_path / ".device_yield")
    monkeypatch.setattr(cfg, "DEVICE_YIELD_FLAG", p)
    return p


def test_request_clear_cycle(flag_path):
    assert not cfg.device_yield_requested()
    cfg.request_device_yield()
    assert os.path.exists(flag_path)
    # the requester itself is exempt (its pid is recorded in the flag)
    assert not cfg.device_yield_requested()
    cfg.clear_device_yield()
    assert not cfg.device_yield_requested()
    cfg.clear_device_yield()  # idempotent


def test_other_process_flag_triggers_yield(flag_path):
    with open(flag_path, "w") as f:
        f.write("pid=999999999\n")
    assert cfg.device_yield_requested()
    with pytest.raises(SystemExit) as exc:
        cfg.maybe_yield_device("unit test")
    assert exc.value.code == cfg.DEVICE_YIELD_RC


def test_stale_flag_is_removed(flag_path):
    with open(flag_path, "w") as f:
        f.write("pid=999999999\n")
    old = time.time() - cfg._YIELD_STALE_S - 60.0
    os.utime(flag_path, (old, old))
    assert not cfg.device_yield_requested()
    assert not os.path.exists(flag_path)  # stale flag cleaned up


def test_touch_keeps_flag_fresh(flag_path):
    with open(flag_path, "w") as f:
        f.write("pid=999999999\n")
    old = time.time() - cfg._YIELD_STALE_S + 120.0
    os.utime(flag_path, (old, old))
    cfg.touch_device_yield()
    assert cfg.device_yield_requested()


def test_yield_resume_argv():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "resilient_run",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "resilient_run.py"),
    )
    rr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rr)
    out = rr.yield_resume_argv(
        ["-p", "train", "-m", "posnet", "-c", "pos_r2", "-o"]
    )
    assert "-o" not in out and "-r" in out
    # idempotent: already-resuming argv unchanged
    assert rr.yield_resume_argv(out) == out


def test_no_yield_without_flag(flag_path):
    cfg.maybe_yield_device("unit test")  # no flag -> no-op


# ---------------------------------------------------------------- watchdog
# assert_device_alive: a dead axon attach parks threads on futexes forever
# and is invisible to outside wrappers; the watchdog turns it into a
# distinct exit code that resilient_run retries with a fresh process.


def test_assert_device_alive_completes():
    # op lands immediately -> returns, no exit
    cfg.assert_device_alive(timeout_s=30.0, _op=lambda: None)


def test_assert_device_alive_exits_on_hang():
    import subprocess
    import sys

    code = (
        "import sys, time; sys.path.insert(0, %r);"
        "from mpp_cnn_rs_object_detection_tpu.utils.config import "
        "assert_device_alive;"
        "assert_device_alive(timeout_s=0.3, _op=lambda: time.sleep(20))"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], timeout=60,
                       capture_output=True, text=True)
    assert r.returncode == cfg.DEVICE_DEAD_RC, (r.returncode, r.stderr)
    assert "device-watchdog" in r.stdout
    assert time.time() - t0 < 30.0  # exited at the watchdog, not the sleep
