"""Host-fingerprinted persistent XLA compile cache.

The persistent compilation cache stores XLA:CPU executables as AOT machine
code, but its key does NOT cover every LLVM target-machine feature — loading
an entry compiled on a different host logs
``cpu_aot_loader.cc: Target machine feature +prefer-no-scatter is not
supported on the host machine ... could lead to execution errors such as
SIGILL`` and then executes anyway. On this project's driver, which moves the
repo between machines across rounds, that manifested as nondeterministic
SIGABRT crashes mid-test (the round-3 flaky ``Fatal Python error: Aborted``
inside jitted train steps). Scoping the cache directory by a CPU-model
fingerprint makes cross-host reuse structurally impossible while keeping
same-host warm starts.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short stable id of this host's CPU model + ISA feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        keep = sorted({l for l in lines if l.startswith(("model name", "flags"))})
        blob = "\n".join(keep)
    except OSError:  # non-Linux fallback: platform description
        import platform

        blob = f"{platform.machine()}-{platform.processor()}"
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def setup_cpu_collective_timeouts(warn: int = 120, terminate: int = 1200) -> None:
    """Make XLA:CPU in-process collectives deadlock-free + starvation-tolerant.

    Two flags, one purpose (8-virtual-device SPMD tests on small hosts):

    1. ``--xla_cpu_enable_concurrency_optimized_scheduler=false``. With the
       concurrency-optimized HLO schedule (the default), each device's thunk
       executor may START independent collectives in a different order; the
       in-process rendezvous then deadlocks on a cycle (observed: dev4 blocked
       in all-reduce op2 [4,5] while dev5 is blocked in all-to-all op12 [4,5]
       — all 8 device threads waiting, forever). The sharded train step
       compiles to ~1500 small collectives, so the crossing fired in ~half of
       all train-CLI test runs as ``rendezvous.cc:127`` CHECK-aborts
       ("Fatal Python error: Aborted"). The sequential scheduler keeps the
       collective order identical on every device: 5/5 clean runs where the
       default deadlocked ~50%.
    2. Raised warn/terminate rendezvous timeouts (defaults 20 s/40 s): on a
       single-core host the 8 device threads execute serially, and under
       background load (another process compiling, loader threads) a thread
       can legitimately take >40 s of wall-clock to reach a collective.

    Must run before the first backend initialization (XLA_FLAGS is parsed
    once). Changing ANY of these values invalidates the persistent compile
    cache (debug options are part of its key) — keep them stable. Flag names
    verified against this image's jaxlib; a rename would make
    parse_flags_from_env abort, so they live in exactly one place, here.
    """
    flags = (
        "--xla_cpu_enable_concurrency_optimized_scheduler=false "
        f"--xla_cpu_collective_call_warn_stuck_timeout_seconds={warn} "
        f"--xla_cpu_collective_call_terminate_timeout_seconds={terminate}"
    )
    cur = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in cur:
        os.environ["XLA_FLAGS"] = f"{cur} {flags}".strip()


def setup_compile_cache(root: str | None = None, min_compile_secs: float = 0.5) -> str:
    """Point jax's persistent compile cache at <root>/<host_fingerprint>.

    Call BEFORE any compilation. Returns the directory used. Env vars are not
    enough in this image (sitecustomize imports jax first), so this must go
    through jax.config.
    """
    import jax

    if root is None:
        root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    path = os.path.join(root, host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
