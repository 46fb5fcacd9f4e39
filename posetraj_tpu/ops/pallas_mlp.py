"""Fused GEGLU feed-forward (MLP) Pallas kernel.

The transformer FF is two matmuls with a GEGLU gate between them
(diffusers attention.py FeedForward; ops/primitives.geglu). XLA cannot fuse
matmul -> gate -> matmul, so the gated intermediate round-trips through HBM —
at the SVD L0 shape (258k tokens x 2560 hidden) that is ~1.3 GB written and
re-read per FF call, ~3 ms of pure bandwidth on v5e. This kernel blocks over
(token rows, hidden columns) and keeps the intermediate in VMEM:

    for each row block i:                      (parallel grid dim)
      acc = 0
      for each hidden block j:                 (arbitrary grid dim, fastest)
        a = x_i @ W1a_j + b1a_j                # fp32
        g = x_i @ W1g_j + b1g_j
        u = a * gelu_exact(g)
        acc += u @ W2_j                        # fp32 accumulation
      out_i = (acc + b2).astype(dtype)

Training gradients: fused_geglu_mlp is wrapped in jax.custom_vjp whose
backward recomputes through the plain XLA formulation — identical math,
so grads are exact; the fused kernel only accelerates forward/inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf approximation (max abs error 1.5e-7 —
    below bf16 resolution): Mosaic has no erf lowering, and the gelu must stay
    numerically the exact-erf form the reference's torch F.gelu uses."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_kernel(x_ref, w1a_ref, w1g_ref, b1a_ref, b1g_ref, w2_ref, b2_ref, o_ref, acc_ref,
                *, n_blocks: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    a = jax.lax.dot_general(
        x, w1a_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1a_ref[...].astype(jnp.float32)
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1g_ref[...].astype(jnp.float32)
    # torch F.gelu default = exact erf form (ops/primitives.gelu)
    u = a * (0.5 * g * (1.0 + _erf(g * (2.0**-0.5))))
    acc_ref[...] += jax.lax.dot_general(
        u.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_blocks - 1)
    def _fin():
        o_ref[...] = (acc_ref[...] + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def _fused_impl(x, w1, b1, w2, b2, block_m: int = 0, block_n: int = 0, interpret: bool = False):
    m, k = x.shape
    n2 = w1.shape[1]
    n = n2 // 2
    k_out = w2.shape[1]

    if block_m == 0:
        # v5e sweep: bm=1024 wins for narrow models; wide models (K=1280)
        # exceed scoped VMEM at larger row blocks (fp32 acc + weight blocks).
        block_m = 1024 if k <= 640 else 512
    if block_n == 0:
        # Keep w1a/w1g/w2 blocks + fp32 intermediates comfortably inside VMEM:
        # wide models (L2: K=1280, N=5120) take 512-column blocks, narrow ones
        # a single block.
        block_n = n if k <= 640 and n <= 2048 else 512
    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)

    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    w1a, w1g = w1[:, :n], w1[:, n:]
    b1a, b1g = b1[:n].reshape(1, n), b1[n:].reshape(1, n)
    b2r = b2.reshape(1, k_out)

    n_blocks = n // block_n
    grid = (m_pad // block_m, n_blocks)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, n_blocks=n_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((block_n, k_out), lambda i, j: (j, 0)),
            pl.BlockSpec((1, k_out), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, k_out), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, k_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w1a, w1g, b1a, b1g, w2, b2r)
    return out[:m]


def _ref_geglu_mlp(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1, preferred_element_type=x.dtype) + b1.astype(x.dtype)
    a, g = jnp.split(h, 2, axis=-1)
    u = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(u, w2, preferred_element_type=x.dtype) + b2.astype(x.dtype)


@jax.custom_vjp
def fused_geglu_mlp(x, w1, b1, w2, b2):
    """out = (a * gelu(g)) @ w2 + b2 where [a|g] = x @ w1 + b1.

    x: (M, K); w1: (K, 2N); b1: (2N,); w2: (N, K_out); b2: (K_out,).
    """
    return _fused_impl(x, w1, b1, w2, b2)


def _fwd(x, w1, b1, w2, b2):
    return _fused_impl(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd(res, ct):
    _, vjp = jax.vjp(_ref_geglu_mlp, *res)
    return vjp(ct)


fused_geglu_mlp.defvjp(_fwd, _bwd)


def fused_geglu_applicable(x, w1) -> bool:
    """TPU-only; pays off when the gated intermediate is large enough that
    its HBM round-trip dominates (small/tiny shapes stay on XLA)."""
    import os

    if os.environ.get("POSETRAJ_FUSED_FF", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    k, n2 = w1.shape
    n = n2 // 2
    # K is not blocked (full rows per program; Mosaic pads the 320-lane case
    # itself); N blocks must tile the lane dim. Wide models (K=1280, L2) stay
    # on XLA: the fused win there is ~2% standalone and the kernel exceeds
    # scoped VMEM when embedded in the full generate() program.
    return m >= 4096 and k <= 640 and n % 128 == 0 and (n % 512 == 0 or n <= 2048)
