"""Micro-bench: transposed-packed TEMPORAL attention sub-layer vs XLA path.

Per-level comparison on the live TPU of
  (a) current: layer_norm -> fused QKV matmul -> frame-axis einsum attention
      (models/transformer._frame_axis_attention) -> to_out matmul -> residual
  (b) packed:  ops/pallas_temporal.temporal_attn_sublayer (3 kernels)

Measurement per NOTES.md: in-graph fori_loop(iters) minus 1-iter delta so the
axon tunnel's per-dispatch overhead cancels; clock stops on a scalar fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from posetraj_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(min_compile_secs=1.0)


def loop_time(fn, x, iters=16):
    def prog(n):
        return jax.jit(lambda x0: jax.lax.fori_loop(0, n, lambda _, t: fn(t), x0))

    p_many, p_one = prog(iters), prog(1)
    r = p_many(x); float(jnp.sum(r))
    r = p_one(x); float(jnp.sum(r))
    t0 = time.perf_counter(); float(jnp.sum(p_many(x)))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jnp.sum(p_one(x)))
    t_one = time.perf_counter() - t0
    return (t_many - t_one) / (iters - 1)


def main():
    from posetraj_tpu.ops.pallas_temporal import (
        _ref_temporal_sublayer,
        temporal_attn_sublayer,
        temporal_attn_sublayer_applicable,
    )

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    B, F = 2, 14  # CFG batch x frames

    for level, (s, c, n) in {
        "L0": (9216, 320, 5),
        "L1": (2304, 640, 10),
        "L2": (576, 1280, 20),
    }.items():
        x = jnp.asarray(rng.randn(B, F, s, c) * 0.1, dt)
        ln_s = jnp.asarray(rng.rand(c), jnp.float32)
        ln_b = jnp.asarray(rng.randn(c) * 0.01, jnp.float32)
        wqkv = jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), dt)
        wo = jnp.asarray(rng.randn(c, c) / np.sqrt(c), dt)
        bo = jnp.asarray(rng.randn(c) * 0.01, dt)

        def cur(t):
            return _ref_temporal_sublayer(t, ln_s, ln_b, wqkv, wo, bo, n, 1e-5)

        def packed(t):
            return temporal_attn_sublayer(t, ln_s, ln_b, wqkv, wo, bo, n)

        if not temporal_attn_sublayer_applicable(x, n):
            print(f"{level} S={s} C={c} N={n}: packed gate OFF (VMEM budget / tiling) — XLA path")
            continue
        a = np.asarray(cur(x), np.float32)
        b = np.asarray(packed(x), np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        t_cur = loop_time(cur, x)
        t_packed = loop_time(packed, x)
        print(
            f"{level} S={s} C={c} N={n}: xla {t_cur*1e3:7.2f} ms  "
            f"packed {t_packed*1e3:7.2f} ms  ({t_cur/t_packed:4.2f}x)  "
            f"rel-err {err:.2e}"
        )


if __name__ == "__main__":
    main()
