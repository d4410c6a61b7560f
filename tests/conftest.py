"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the survey's test strategy (SURVEY.md §4): multi-chip behavior is
validated on a simulated 8-device CPU mesh so CI needs no TPU. Pallas kernels
run with interpret=True under this configuration (see zig_vulkan_tpu.ops).
"""

import os

# The session environment pins JAX_PLATFORMS to the TPU platform; tests must
# run on the virtual CPU mesh, so override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: the DDA while-loops are expensive to compile
# on CPU; cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zig_vulkan_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
