"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the survey's test strategy (SURVEY.md §4): multi-chip behavior is
validated on a simulated 8-device CPU mesh so CI needs no TPU. Pallas
kernels run with interpret=True under this configuration.

The session environment registers a TPU PJRT plugin from sitecustomize and
pins jax_platforms, so plain JAX_PLATFORMS=cpu is not enough: the platform
must be overridden at the jax.config level before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# small ray tiles on CPU: the Pallas kernels run interpret=True in tests
# and 24-sublane tiles triple the interpreted work for no coverage gain
os.environ.setdefault("ZVT_TILE_SUBLANES", "8")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the DDA while-loops are expensive to compile
# on CPU; cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zig_vulkan_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

# Quick tier (round-3 verdict: the serial suite passed 15 minutes and the
# interpret-mode Pallas modules dominate): whole modules whose tests run
# the Pallas kernels under interpret=True or chain full engine frames are
# marked `slow`; `pytest -m "not slow"` runs the fast unit/parity tier.
_SLOW_MODULES = {
    "test_tile_tracer",
    "test_parity_at_scale",
    "test_parallel",
    "test_bench_configs",
    "test_emissive_temporal",
    "test_engine",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
