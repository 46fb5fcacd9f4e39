"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md section 4).

This image boots an `axon` TPU PJRT plugin from sitecustomize, which imports
jax before any test code runs — so plain env vars are too late; the platform
and host-device-count must be forced through jax.config here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the model-stack tests jit whole forwards; this
# makes re-runs near-instant. Host-fingerprinted: cross-host AOT reuse crashes
# (see posetraj_tpu/utils/compile_cache.py).
from posetraj_tpu.utils.compile_cache import (
    setup_compile_cache,
    setup_cpu_collective_timeouts,
)

setup_cpu_collective_timeouts()
setup_compile_cache()

assert jax.default_backend() == "cpu", jax.default_backend()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long multi-process/compile-heavy tests"
    )
