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


def _mlp_kernel(*refs, n_blocks: int, ln_eps: float = 0.0, with_ln: bool = False,
                with_res: bool = False, with_add: bool = False):
    refs = list(refs)
    x_ref, w1a_ref, w1g_ref, b1a_ref, b1g_ref, w2_ref, b2_ref = refs[:7]
    rest = refs[7:]
    ln_s_ref = ln_b_ref = add_ref = None
    if with_ln:
        ln_s_ref, ln_b_ref = rest[:2]
        rest = rest[2:]
    if with_add:
        add_ref = rest[0]
        rest = rest[1:]
    o_ref, acc_ref = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if add_ref is not None:
        # Broadcast addend fold (the single-token cross-attention fast-path
        # vector, models/transformer.py): x' = x + add becomes this kernel's
        # input AND its residual — the standalone broadcast-add pass over the
        # activation never exists. add block: (1, bm, K) row-wise or
        # (1, 1, K) broadcast.
        x = x + add_ref[0].astype(x.dtype)
    x_res = x
    if ln_s_ref is not None:
        # LayerNorm prologue: K is never blocked, so each (bm, K) x-block
        # holds complete rows — row stats come free in VMEM, and the whole
        # separate LN pass over HBM (read + write + fp32 temps) disappears.
        # Matches ops/primitives.layer_norm numerics: fp32 stats and apply,
        # cast back to the compute dtype before the matmuls. Recomputed per
        # n-block program (n_blocks small; LN is O(K) vs matmul O(K*bn)).
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
        xn = xn * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(jnp.float32)
        x = xn.astype(x.dtype)
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
        out = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        if with_res:
            # Transformer blocks always compute x + ff(ln(x)): the residual
            # IS the kernel's raw input block (plus the folded addend),
            # already in VMEM — fusing the add deletes a whole
            # read+read+write elementwise pass per FF.
            out = out + x_res.astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block_m(k: int) -> int:
    # In-graph fori_loop sweep on v5e (dispatch-overhead-free): narrow
    # models peak at bm=1024 (L0 106 TF/s; L1 drops to 768 — the LN
    # prologue's fp32 row temps push bm=1024 past scoped VMEM at K=640);
    # the wide L2 model (K=1280) exceeds scoped VMEM at bm>=512 inside
    # the full generate() program, and bm=256 still beats XLA.
    if k <= 384:
        return 1024
    if k <= 640:
        return 768
    return 256


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret", "ln_eps", "residual"))
def _fused_impl(x, w1, b1, w2, b2, ln_s=None, ln_b=None, ln_eps: float = 1e-5,
                block_m: int = 0, block_n: int = 0, interpret: bool = False,
                residual: bool = False, add=None):
    m, k = x.shape
    n2 = w1.shape[1]
    n = n2 // 2
    k_out = w2.shape[1]

    if block_m == 0:
        block_m = _pick_block_m(k)
    if block_n == 0:
        # Keep w1a/w1g/w2 blocks + fp32 intermediates comfortably inside VMEM:
        # wide models (L2: K=1280, N=5120) take 512-column blocks; the narrow
        # L0 model splits its 1280 hidden into 2 blocks — the fp32 gate
        # intermediates (bm, bn) are the scoped-VMEM driver, and the training
        # graph (fp32 LN params + remat rewraps) sits right at the 16M limit
        # with a single full-width block.
        if k <= 384:
            block_n = n if n <= 640 else (n // 2 if n % 1024 != 0 else 512)
        elif k <= 640 and n <= 2048:
            block_n = n
        else:
            block_n = 512
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
    in_specs = [
        pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
        pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
        pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
        pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        pl.BlockSpec((block_n, k_out), lambda i, j: (j, 0)),
        pl.BlockSpec((1, k_out), lambda i, j: (0, 0)),
    ]
    inputs = [x, w1a, w1g, b1a, b1g, w2, b2r]
    with_ln = ln_s is not None
    if with_ln:
        in_specs += [
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, k), lambda i, j: (0, 0)),
        ]
        inputs += [ln_s.reshape(1, k), ln_b.reshape(1, k)]
    if add is not None:
        # add (G, S_a, K): flat row r reads add[r // (m // G), r % S_a] — a
        # per-sample vector (S_a == 1) or a per-pixel slab shared across an
        # outer repeat axis (S_a > 1, e.g. the temporal block's (B, S, C)
        # vector shared over frames). Constraints checked by
        # mlp_addend_foldable: no row padding, blocks never straddle the
        # S_a extent.
        g, s_a, _ = add.shape
        rows_per_outer = m // g
        assert m % block_m == 0 and m % g == 0 and rows_per_outer % s_a == 0, (m, g, s_a)
        assert rows_per_outer % block_m == 0, (rows_per_outer, block_m)
        assert s_a == 1 or s_a % block_m == 0, (s_a, block_m)
        ba = min(block_m, s_a)
        if s_a == 1:
            add_idx = lambda i, j: (i * block_m // rows_per_outer, 0, 0)
        else:
            add_idx = lambda i, j: (
                i * block_m // rows_per_outer, (i * block_m % s_a) // block_m, 0
            )
        in_specs += [pl.BlockSpec((1, ba, k), add_idx)]
        inputs += [add]
    if residual:
        assert k_out == k, (k_out, k)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, n_blocks=n_blocks, ln_eps=ln_eps, with_ln=with_ln,
                          with_res=residual, with_add=add is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, k_out), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, k_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    return out[:m]


def _ref_geglu_mlp(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1, preferred_element_type=x.dtype) + b1.astype(x.dtype)
    a, g = jnp.split(h, 2, axis=-1)
    u = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(u, w2, preferred_element_type=x.dtype) + b2.astype(x.dtype)


def _ref_ln_geglu_mlp(x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
    return _ref_geglu_mlp(xn.astype(x.dtype), w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_geglu_mlp(x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5):
    """LayerNorm + GEGLU MLP in one kernel pass (norm3->ff / norm_in->ff_in
    adjacency in every transformer block): out = geglu_mlp(layer_norm(x)).
    Gradients route through the plain XLA formulation (custom_vjp)."""
    return _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b, ln_eps=eps)


def _ln_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps):
    return _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b, ln_eps=eps), (
        x, ln_s, ln_b, w1, b1, w2, b2)


def _ln_bwd(eps, res, ct):
    _, vjp = jax.vjp(lambda *a: _ref_ln_geglu_mlp(*a, eps=eps), *res)
    return vjp(ct)


fused_ln_geglu_mlp.defvjp(_ln_fwd, _ln_bwd)


def _ref_ln_geglu_mlp_res(x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5):
    return x + _ref_ln_geglu_mlp(x, ln_s, ln_b, w1, b1, w2, b2, eps)


def _broadcast_add_rows(x, add):
    """x (M, K) + add (G, S_a, K) where row r takes add[r // (M//G), r % S_a]
    (XLA formulation of the kernel's addend fold, used by the backward)."""
    m, k = x.shape
    g, s_a, _ = add.shape
    rep = m // (g * s_a)
    return (x.reshape(g, rep, s_a, k) + add[:, None].astype(x.dtype)).reshape(m, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_geglu_mlp_res(x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5):
    """out = x + geglu_mlp(layer_norm(x)) — the full pre-norm FF sub-layer in
    one kernel pass (LN prologue + residual epilogue both free in VMEM)."""
    return _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b, ln_eps=eps, residual=True)


def _ln_res_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps):
    return (
        _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b, ln_eps=eps, residual=True),
        (x, ln_s, ln_b, w1, b1, w2, b2),
    )


def _ln_res_bwd(eps, res, ct):
    _, vjp = jax.vjp(lambda *a: _ref_ln_geglu_mlp_res(*a, eps=eps), *res)
    return vjp(ct)


fused_ln_geglu_mlp_res.defvjp(_ln_res_fwd, _ln_res_bwd)


def _ref_ln_geglu_mlp_res_add(x, ln_s, ln_b, w1, b1, w2, b2, add, eps=1e-5):
    xa = _broadcast_add_rows(x, add)
    return xa + _ref_ln_geglu_mlp(xa, ln_s, ln_b, w1, b1, w2, b2, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_ln_geglu_mlp_res_add(x, ln_s, ln_b, w1, b1, w2, b2, add, eps=1e-5):
    """out = (x+a) + geglu_mlp(layer_norm(x+a)) — the FF sub-layer with a
    broadcast addend folded in. `a` is the single-token cross-attention
    fast-path vector (models/transformer.py attention_module /
    _frame_axis_attention: softmax over one CLIP token is identically 1, so
    the whole attn2 sub-layer reduces to x + to_out(to_v(ctx)) broadcast).
    Folding that broadcast here deletes its standalone read+write pass over
    the activation. add: (G, S_a, K), see _broadcast_add_rows / _fused_impl."""
    return _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b, ln_eps=eps,
                       residual=True, add=add)


def _ln_res_add_fwd(x, ln_s, ln_b, w1, b1, w2, b2, add, eps):
    return (
        _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b, ln_eps=eps,
                    residual=True, add=add),
        (x, ln_s, ln_b, w1, b1, w2, b2, add),
    )


def _ln_res_add_bwd(eps, res, ct):
    _, vjp = jax.vjp(lambda *a: _ref_ln_geglu_mlp_res_add(*a, eps=eps), *res)
    return vjp(ct)


fused_ln_geglu_mlp_res_add.defvjp(_ln_res_add_fwd, _ln_res_add_bwd)


def mlp_addend_foldable(x, add) -> bool:
    """Whether `add` (broadcast vector, canonical 3D (G, S_a, C)) can ride
    the fused FF kernel's in-kernel addend: rows must tile block_m exactly
    (no padding — padded blocks would index past the addend), every row
    block must sit inside one S_a extent, and the repeat factor must be
    integral."""
    k = x.shape[-1]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    g, s_a = add.shape[0], add.shape[-2] if add.ndim > 2 else 1
    if add.shape[-1] != k or m % max(g, 1) != 0:
        return False
    bm = _pick_block_m(k)
    rows_per_outer = m // g
    return (
        m % bm == 0
        and rows_per_outer % s_a == 0
        and rows_per_outer % bm == 0  # no block straddles an outer group
        and (s_a == 1 or s_a % bm == 0)
    )


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
    from posetraj_tpu.configs import kernel_config

    if not kernel_config().fused_ff:
        return False
    if jax.default_backend() != "tpu":
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    k, n2 = w1.shape
    n = n2 // 2
    # K is not blocked (full rows per program; Mosaic pads the 320-lane case
    # itself); N blocks must tile the lane dim. In-graph sweep: fused beats
    # XLA at every SVD level incl. the wide L2 (K=1280: 3.69 vs 4.46 ms at
    # bm=256 — the earlier "~2% win" was per-dispatch overhead polluting the
    # measurement); L2 runs bm=256 to stay inside scoped VMEM in the full
    # generate() program.
    if k > 640 and not kernel_config().fused_ff_wide:
        return False
    return m >= 4096 and k <= 1280 and n % 128 == 0 and (n % 512 == 0 or n <= 2048)
