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


_BIG_STACK_POOL = None


def raise_stack_limit(stack_mib: int = 256) -> None:
    """Route XLA compiles (and cached-executable deserialization) through a
    dedicated worker thread with a large explicit stack.

    XLA:CPU's compiler recurses over the HLO graph on the CALLING thread, and
    the unit-granularity remat graph (configs.py TrainConfig.remat_granularity)
    has enough checkpoint regions that compiling — or RELOADING from the
    persistent cache — the tiny train step overflows the default 8 MiB main
    stack: a hard SIGSEGV inside backend_compile_and_load /
    get_executable_and_time (observed round 5, tests/test_train.py).

    Raising RLIMIT_STACK at runtime does NOT work: the kernel computed
    mmap_base from the limit at exec time, so the main stack has no room to
    grow into (still segfaulted at a 64 MiB soft limit). Re-exec breaks under
    pytest (its capture has already dup2'd the fds). A worker thread created
    after `threading.stack_size(...)` gets the large stack directly.

    Monkeypatches jax._src.compiler.backend_compile_and_load and
    jax._src.compilation_cache.get_executable_and_time (both referenced via
    module globals by their callers, so the patch is seen); guarded per-symbol
    so a jax upgrade degrades to status quo, not an error. The TPU path is
    unaffected either way — its compiles run in the tunnel's helper process."""
    global _BIG_STACK_POOL
    if _BIG_STACK_POOL is not None:
        return
    import concurrent.futures
    import threading

    old = threading.stack_size(stack_mib << 20)
    pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="xla-bigstack"
    )
    # Force the worker into existence while the large stack size is active.
    pool.submit(lambda: None).result()
    threading.stack_size(old)
    _BIG_STACK_POOL = pool

    def _wrap(mod, name):
        orig = getattr(mod, name, None)
        if orig is None or getattr(orig, "_posetraj_bigstack", False):
            return

        def patched(*a, **k):
            return pool.submit(orig, *a, **k).result()

        patched._posetraj_bigstack = True
        patched.__name__ = getattr(orig, "__name__", name)
        setattr(mod, name, patched)

    try:
        from jax._src import compilation_cache as _cc
        from jax._src import compiler as _compiler

        _wrap(_compiler, "backend_compile_and_load")
        _wrap(_cc, "get_executable_and_time")
    except ImportError:
        pass


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
    raise_stack_limit()
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

    raise_stack_limit()
    if root is None:
        root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    path = os.path.join(root, host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
