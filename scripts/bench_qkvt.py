"""Micro-bench: transposed-packed attention sub-layer vs the current path.

Per-level comparison on the live TPU of
  (a) current: layer_norm -> fused QKV matmul -> flash_attention_tq (with its
      fold/transpose layout ops) -> to_out matmul -> residual
  (b) packed:  ops/pallas_qkvt.attn_sublayer (3 kernels, zero layout traffic)

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
    """On-device fori_loop(iters) vs (1): per-iter seconds, overhead-free."""
    def prog(n):
        return jax.jit(
            lambda x0: jax.lax.fori_loop(0, n, lambda _, t: fn(t), x0),
            static_argnums=(),
        )

    p_many, p_one = prog(iters), prog(1)
    r = p_many(x); jnp.sum(r).block_until_ready(); float(jnp.sum(r))
    r = p_one(x); float(jnp.sum(r))
    t0 = time.perf_counter(); float(jnp.sum(p_many(x)))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jnp.sum(p_one(x)))
    t_one = time.perf_counter() - t0
    return (t_many - t_one) / (iters - 1)


def main():
    from posetraj_tpu.ops.attention import attention
    from posetraj_tpu.ops.pallas_qkvt import attn_sublayer, attn_sublayer_applicable
    from posetraj_tpu.ops.primitives import layer_norm

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    BF = 28  # CFG x frames

    for level, (s, c, n) in {
        "L0": (9216, 320, 5),
        "L1": (2304, 640, 10),
        "L2": (576, 1280, 20),
    }.items():
        x = jnp.asarray(rng.randn(BF, s, c) * 0.1, dt)
        ln_s = jnp.asarray(rng.rand(c), jnp.float32)
        ln_b = jnp.asarray(rng.randn(c) * 0.01, jnp.float32)
        wqkv = jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), dt)
        wo = jnp.asarray(rng.randn(c, c) / np.sqrt(c), dt)
        bo = jnp.asarray(rng.randn(c) * 0.01, dt)

        def cur(t):
            h = layer_norm({"scale": ln_s, "bias": ln_b}, t).astype(dt)
            qkv = jnp.dot(h, wqkv, preferred_element_type=dt)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = attention(q, k, v, n)
            return t + jnp.dot(out, wo, preferred_element_type=dt) + bo

        def packed(t):
            return attn_sublayer(t, ln_s, ln_b, wqkv, wo, bo, n)

        assert attn_sublayer_applicable(x, n), (level, s, c, n)
        # numerics first (same-device comparison at one call)
        a = np.asarray(cur(x), np.float32)
        b = np.asarray(packed(x), np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        t_cur = loop_time(cur, x)
        t_packed = loop_time(packed, x)
        # useful-FLOPs rate for the attention alone (2*2*S^2*C per instance)
        att_tf = 2 * 2 * s * s * c * BF / t_packed / 1e12
        print(
            f"{level} S={s} C={c} N={n}: current {t_cur*1e3:7.2f} ms  "
            f"packed {t_packed*1e3:7.2f} ms  ({t_cur/t_packed:4.2f}x)  "
            f"rel-err {err:.2e}  [{att_tf:.0f} TF/s attn-only-equiv]"
        )


if __name__ == "__main__":
    main()
