"""Transposed-packed TEMPORAL (frame-axis) attention sub-layer.

The temporal transformer blocks attend over the 14-frame axis per pixel:
x (B, F, S, C) with seq = F tiny and batch = B*S huge. The XLA formulation
(models/transformer._frame_axis_attention) is einsum-based — qkv projection,
(B, N, Fq, Fk, S) fp32 logits, softmax, PV einsum, out projection — which
round-trips HBM between every stage (~0.5 GB of intermediate traffic per L0
instance) and runs its tiny 14x64x14 contractions far off the MXU's
preferred shapes. There are ~23 temporal blocks per denoise step.

Same design as the spatial sub-layer (ops/pallas_qkvt.py), but every tensor
between the three kernels is FOUR-dimensional with the frame axis OUTSIDE
the (sublane, lane) tiled pair:

  kernel 1  _ln_qkvt_kernel4   x (B, F, S, C) -> qkv4 (B, F, 3C, S)
            LayerNorm + fused-QKV matmul with transposed output, one
            (batch*frame, s-block, d-block) program.
  kernel 2  _frame_attn_kernel qkv4 (B, F, 3C, S); one (batch, head,
            s-block) program holds the FULL frame extent for a block of
            pixels as (F, H, bs) and computes the 14x14 per-pixel attention
            on the VPU: logits[j, s] = sum_h q[i, h, s] * k[j, h, s] as
            broadcast-multiply + sublane reductions (the contraction is
            per-pixel, so the MXU cannot be used without a gather; at F=14
            the whole chain is ~2.3 GFLOP/step — VPU territory). Softmax is
            exact (full F extent in VMEM), exp2 with log2(e) folded into the
            q scale like every other kernel here.
  kernel 3  _out_proj_kernel4  o4 (B, F, C, S) -> (B, F, S, C) with the
            to_out projection transposing back for free and the residual
            fused.

Why 4D (round-4 trace finding): the round-3 version ran the flat-token
kernels of pallas_qkvt (B, 3C, F*S) and reshaped to (B, 3C, F, S) around the
frame kernel. That reshape moves the frame axis INTO the physical (8, 128)
tile (channel-sublanes -> frame-sublanes), so XLA must emit a real relayout
copy on both sides — ~45 ms/step of pure copies at the flagship shapes
(2x ~500 MB tensors per L0 instance). With F kept outside the tiled pair in
every kernel's Block shape, all three custom calls agree on the default
layout and no copy exists anywhere in the sub-layer.

Gradients: custom_vjp recomputing through the XLA einsum formulation
(identical math; F=14 logits are tiny so the XLA backward is cheap, and the
training path's per-block jax.checkpoint recomputes forward activations
anyway).

Replaces the torch TemporalBasicTransformerBlock attn1 sub-layer
(diffusers 0.24.0 attention.py; reference consumes it via
unet_spatio_temporal_condition_controlnet.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posetraj_tpu.ops.pallas_qkvt import _pick_block_s

_LOG2E = 1.4426950408889634


# ---------------------------------------------------------------------------
# Kernel 1: LayerNorm + QKV projection with transposed output, frame-major
# ---------------------------------------------------------------------------


def _ln_qkvt_kernel4(x_ref, wt_ref, lns_ref, lnb_ref, o_ref, *, eps: float):
    """One (batch*frame, s-block, d-block) program.
    x_ref (1, 1, bs, C); wt_ref (bd, C); o_ref (1, 1, bd, bs).
    Same math as pallas_qkvt._ln_qkvt_kernel, 4D refs."""
    xf = x_ref[0, 0].astype(jnp.float32)                   # (bs, C)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    h = xn.astype(o_ref.dtype)                              # (bs, C)
    o_ref[0, 0] = jax.lax.dot_general(
        wt_ref[...], h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_s", "interpret"))
def ln_qkvt_proj4(x, wt, ln_s, ln_b, eps: float = 1e-5, block_s: int = 0,
                  interpret: bool | None = None):
    """x (B, F, S, C), wt (3C, C) [rows q|k|v] -> qkv4 (B, F, 3C, S) =
    Wt @ layer_norm(x)^T per frame, frame axis outside the tiled dims."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, f, s, c = x.shape
    d3 = wt.shape[0]
    if block_s == 0:
        block_s = _pick_block_s(s)
    block_d = d3 if c <= 640 else 640  # see pallas_qkvt.ln_qkvt_proj
    while d3 % block_d != 0:
        block_d //= 2
    assert s % block_s == 0 and d3 % block_d == 0, (s, block_s, d3, block_d)

    grid = (b * f, s // block_s, d3 // block_d)
    out = pl.pallas_call(
        functools.partial(_ln_qkvt_kernel4, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_s, c), lambda bfi, si, di: (bfi // f, bfi % f, si, 0)),
            pl.BlockSpec((block_d, c), lambda bfi, si, di: (di, 0)),
            pl.BlockSpec((1, c), lambda bfi, si, di: (0, 0)),
            pl.BlockSpec((1, c), lambda bfi, si, di: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_d, block_s), lambda bfi, si, di: (bfi // f, bfi % f, di, si)
        ),
        out_shape=jax.ShapeDtypeStruct((b, f, d3, s), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x, wt, ln_s.reshape(1, c), ln_b.reshape(1, c))
    return out


# ---------------------------------------------------------------------------
# Kernel 2: per-pixel attention over the frame axis
# ---------------------------------------------------------------------------


def _frame_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch, head, s-block) program, all refs (1, F, H, bs): the frame
    axis rides the (cheap) outer block dim, head_dim in the sublanes, pixels
    in the lanes. Per-pixel attention over F."""
    q = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)  # (F, H, bs)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    f = q.shape[0]

    outs = []
    for i in range(f):  # trace-time unroll, F <= 16 at every SVD config
        q_i = q[i]                                    # (H, bs)
        s_i = jnp.sum(q_i[None, :, :] * k, axis=1)    # (F, bs) fp32 logits
        m = jnp.max(s_i, axis=0, keepdims=True)       # (1, bs)
        p = jnp.exp2(s_i - m)                         # (F, bs)
        l = jnp.sum(p, axis=0, keepdims=True)         # (1, bs)
        o_i = jnp.sum(p[:, None, :] * v, axis=0)      # (H, bs)
        outs.append(o_i / l)
    o_ref[0] = jnp.stack(outs, axis=0).astype(o_ref.dtype)  # (F, H, bs)


# Scoped-VMEM cost model for _frame_attn_kernel, measured on v5e: the
# compiler reported 26.83 MB at (H=64, F=14, bs=512) = 58.5 bytes per
# (H*F*bs) block element — 3 double-buffered bf16 input blocks (12 B) +
# double-buffered bf16 output (4 B) + fp32 q/k/v temps (12 B) + the unrolled
# softmax temps and the stacked fp32 output (~30 B as Mosaic allocates them).
# 64 B/elem is that measurement with margin; 12 MB keeps 4 MB headroom under
# the 16 MB scoped-vmem limit for Mosaic's own scratch.
_BYTES_PER_BLOCK_ELEM = 64
_VMEM_BUDGET = 12 * 1024 * 1024


def frame_block_s(s: int, head_dim: int, f: int) -> int | None:
    """Pixel-block size for the frame-attention kernel: the largest
    128-aligned divisor of S (or S itself as a full lane axis when small)
    whose estimated scoped-VMEM footprint fits the budget; None when S
    doesn't tile or nothing fits. BENCH_r03 postmortem: this MUST be sized
    from bytes, not guessed — bs=512 at (H=64, F=14) needs 26.83 MB."""

    def fits(bs: int) -> bool:
        return head_dim * f * bs * _BYTES_PER_BLOCK_ELEM <= _VMEM_BUDGET

    for bs in (512, 384, 256, 128):
        if s % bs == 0 and fits(bs):
            return bs
    if s <= 1024 and fits(s):
        return s
    return None


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def frame_attention_t(qkv4, num_heads: int, scale: float,
                      interpret: bool | None = None):
    """qkv4 (B, F, 3C, S) [row-blocks q|k|v, each C = num_heads * H] ->
    o4 (B, F, C, S): per-pixel attention over the frame axis. Every block
    keeps F outside the (sublane, lane) pair, so producer/consumer layouts
    agree with kernels 1/3 and no relayout copy exists (module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, f, d3, s = qkv4.shape
    c = d3 // 3
    h = c // num_heads
    n = num_heads
    bs = frame_block_s(s, h, f)
    assert bs is not None, (s, h, f)

    grid = (b, n, s // bs)
    out = pl.pallas_call(
        functools.partial(_frame_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f, h, bs), lambda bi, ni, si: (bi, 0, ni, si)),
            pl.BlockSpec((1, f, h, bs), lambda bi, ni, si: (bi, 0, n + ni, si)),
            pl.BlockSpec((1, f, h, bs), lambda bi, ni, si: (bi, 0, 2 * n + ni, si)),
        ],
        out_specs=pl.BlockSpec((1, f, h, bs), lambda bi, ni, si: (bi, 0, ni, si)),
        out_shape=jax.ShapeDtypeStruct((b, f, c, s), qkv4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
        interpret=interpret,
    )(qkv4, qkv4, qkv4)
    return out


# ---------------------------------------------------------------------------
# Kernel 3: out-projection back to natural layout + residual, frame-major
# ---------------------------------------------------------------------------


def _out_proj_kernel4(ot_ref, wo_ref, bo_ref, res_ref, o_ref):
    """One (batch*frame, s-block) program: o_ref (1, 1, bs, C') =
    res + o_t^T @ Wo + bo, the transpose free in the contraction.
    ot_ref (1, 1, C, bs); wo_ref (C, C'); res_ref (1, 1, bs, C')."""
    y = jax.lax.dot_general(
        ot_ref[0, 0], wo_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bs, C')
    y = y + bo_ref[...].astype(jnp.float32) + res_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def out_proj_res4(o4, wo, bo, res, block_s: int = 0, interpret: bool | None = None):
    """o4 (B, F, C, S), wo (C, C'), bo (C',), res (B, F, S, C') ->
    (B, F, S, C') = res + o4^T @ wo + bo per frame."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, f, c, s = o4.shape
    c_out = wo.shape[1]
    if block_s == 0:
        block_s = _pick_block_s(s)
    assert s % block_s == 0, (s, block_s)
    grid = (b * f, s // block_s)
    out = pl.pallas_call(
        _out_proj_kernel4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, c, block_s), lambda bfi, si: (bfi // f, bfi % f, 0, si)),
            pl.BlockSpec((c, c_out), lambda bfi, si: (0, 0)),
            pl.BlockSpec((1, c_out), lambda bfi, si: (0, 0)),
            pl.BlockSpec((1, 1, block_s, c_out), lambda bfi, si: (bfi // f, bfi % f, si, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_s, c_out), lambda bfi, si: (bfi // f, bfi % f, si, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, f, s, c_out), res.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(o4, wo, bo.reshape(1, c_out), res)
    return out


# ---------------------------------------------------------------------------
# The fused sub-layer: x + to_out(frame_attn(LN(x))) with exact XLA gradients
# ---------------------------------------------------------------------------


def _ref_temporal_sublayer(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps):
    """The XLA formulation of the same sub-layer (layer_norm + fused QKV +
    models/transformer._frame_axis_attention einsum chain + out proj), used
    for gradients and as the numerics oracle."""
    from posetraj_tpu.ops.primitives import layer_norm

    b, f, s, c = x.shape
    hd = c // num_heads
    h = layer_norm({"scale": ln_s, "bias": ln_b}, x, eps=eps).astype(x.dtype)
    qkv = jnp.dot(h, wqkv.astype(x.dtype), preferred_element_type=x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, f, s, num_heads, hd)
    k = k.reshape(b, f, s, num_heads, hd)
    v = v.reshape(b, f, s, num_heads, hd)
    logits = jnp.einsum("bqsnh,bksnh->bnqks", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * (hd**-0.5), axis=3)
    out = jnp.einsum("bnqks,bksnh->bqsnh", probs.astype(q.dtype), v,
                     preferred_element_type=q.dtype).reshape(b, f, s, c)
    return x + jnp.dot(out, wo.astype(x.dtype), preferred_element_type=x.dtype) \
        + bo.astype(x.dtype)


def _fused_impl(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps):
    b, f, s, c = x.shape
    wt = wqkv.astype(x.dtype).T  # (3C, C); loop-invariant, hoisted by XLA
    qkv4 = ln_qkvt_proj4(x, wt, ln_s, ln_b, eps=eps)        # (B, F, 3C, S)
    hd = c // num_heads
    o4 = frame_attention_t(qkv4, num_heads, hd**-0.5)       # (B, F, C, S)
    return out_proj_res4(o4, wo.astype(x.dtype), bo.astype(x.dtype), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def temporal_attn_sublayer(x, ln_s, ln_b, wqkv, wo, bo, num_heads: int,
                           eps: float = 1e-5):
    """x (B, F, S, C) -> x + to_out(frame_attention(layer_norm(x))): the full
    pre-norm temporal self-attention sub-layer in three frame-major
    transposed-packed Pallas kernels. wqkv (C, 3C) = [Wq|Wk|Wv]."""
    return _fused_impl(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps)


def _tas_fwd(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps):
    return _fused_impl(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps), (
        x, ln_s, ln_b, wqkv, wo, bo)


def _tas_bwd(num_heads, eps, res, ct):
    _, vjp = jax.vjp(lambda *a: _ref_temporal_sublayer(*a, num_heads, eps), *res)
    return vjp(ct)


temporal_attn_sublayer.defvjp(_tas_fwd, _tas_bwd)


def temporal_attn_sublayer_applicable(x, num_heads: int) -> bool:
    """TPU-only; S must tile the pixel-block grid of the frame kernel AND the
    per-frame s-blocks of the projection/out-proj kernels (no padding
    possible in the packed layout)."""
    from posetraj_tpu.configs import kernel_config

    if not kernel_config().temporal_attn:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, f, s, c = x.shape
    if c % num_heads != 0 or (c // num_heads) % 8 != 0:
        return False
    if f > 16:  # trace-time unroll bound; every SVD config is F<=14
        return False
    if frame_block_s(s, c // num_heads, f) is None:
        return False
    # kernels 1/3 block the per-frame token axis: a proper 128-aligned
    # divisor must exist (the full-axis fallback of _pick_block_s would put
    # the whole S extent in one VMEM block, fine only when small).
    bs = _pick_block_s(s)
    return (bs < s or s <= 1024) and s >= 128
