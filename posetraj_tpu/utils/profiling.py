"""Tracing and per-stage timing.

The reference has no profiling at all (SURVEY.md section 5.1 — only tqdm
bars); here device traces (`jax.profiler`, viewable in TensorBoard/Perfetto)
and host-side stage timers are first-class.

On high-latency device tunnels, wall-clock around an async dispatch is
meaningless — StageTimer therefore synchronizes via jax.block_until_ready on
the stage's outputs when given them.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace("/tmp/trace"): run()` then open in
    TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating named-stage timer.

        timer = StageTimer()
        with timer.stage("encode"):
            latents = encode(...)          # sync via outputs=
        print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, outputs=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            sync_target = box.get("outputs", outputs)
            if sync_target is not None:
                jax.block_until_ready(sync_target)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            t = self.totals[name]
            lines.append(f"{name}: total {t:.3f}s x{n} (avg {t / n:.4f}s)")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)
