"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md section 4).

This image boots an `axon` TPU PJRT plugin from sitecustomize, which imports
jax before any test code runs — so plain env vars are too late; the platform
and host-device-count must be forced through jax.config here.
"""

import os
import sys

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


def pytest_collection_modifyitems(session, config, items):
    """Run the trainer tests FIRST. XLA:CPU segfaults (hard SIGSEGV in C++,
    uncatchable) compiling OR deserializing the unit-remat flagship-recipe
    train step after ~165 other tests' executables have loaded in the same
    process — most recently right after test_sharded_single_video's sharded
    programs — while the identical programs compile, cache-load, and run
    fine in a fresh process (tests/test_train.py standalone is green; 3
    full-suite runs crashed at the same item). Until the upstream bug is
    understood, order the fragile compiles into the fresh-process window.
    Alphabetical order is otherwise preserved."""
    front = [it for it in items if "test_train.py" in str(it.fspath)]
    rest = [it for it in items if "test_train.py" not in str(it.fspath)]
    items[:] = front + rest
