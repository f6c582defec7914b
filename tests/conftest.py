"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Emulates a TPU mesh without hardware (SURVEY.md §4) via
``xla_force_host_platform_device_count``. The XLA flag must be set before the
backend initialises; ``jax.config.update`` pins the cpu platform (the axon TPU
plugin ignores the JAX_PLATFORMS env var in this image).
"""

import os
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Process-level device-yield isolation: utils.config binds the flag path at
# import, and module/session-scoped fixtures (e.g. the pipeline workspaces
# that train tiny CNNs) run OUTSIDE the function-scoped monkeypatch fixture
# below — a live probe's real flag would SystemExit them mid-setup.
os.environ["MPP_DEVICE_YIELD_FLAG"] = os.path.join(
    tempfile.mkdtemp(prefix="mpp_test_yield_"), ".device_yield"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_last_module = [None]


def pytest_runtest_setup(item):
    """Drop compiled executables between test modules.

    The image's XLA CPU backend segfaults in ``backend_compile`` late in
    long processes (observed at the ~100th compile-heavy test; also noted in
    ``ops/geometry.py`` for nested-vmap graphs). Clearing JAX's executable
    and tracing caches at module boundaries keeps the per-process compiler
    state bounded without changing any test's behaviour."""
    module = item.module.__name__
    if _last_module[0] is not None and module != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = module


import pytest  # noqa: E402

# fast pre-commit tier (scripts/quick_check.sh): modules measured ~1-2 min
# TOTAL on this 1-core host even under runbook CPU contention; everything
# compile-heavy (trainers, chains, scenes) stays in the full suite
_QUICK_MODULES = {
    "test_device_lease",
    "test_geometry",
    "test_ops_misc",
    "test_metrics",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True)
def _isolate_device_yield_flag(tmp_path, monkeypatch):
    """Tests must never see (or raise) the real device-yield flag: a live
    runbook's flag would SystemExit trainer tests mid-epoch, and test flags
    must not preempt real runbook stages."""
    from mpp_cnn_rs_object_detection_tpu.utils import config as _cfg

    monkeypatch.setattr(
        _cfg, "DEVICE_YIELD_FLAG", str(tmp_path / ".device_yield")
    )
