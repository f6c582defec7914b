"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Emulates a TPU mesh without hardware (SURVEY.md §4) via
``xla_force_host_platform_device_count``. The XLA flag must be set before the
backend initialises; ``jax.config.update`` pins the cpu platform (the axon TPU
plugin ignores the JAX_PLATFORMS env var in this image).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
