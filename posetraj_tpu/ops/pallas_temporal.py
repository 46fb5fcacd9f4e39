"""Transposed-packed TEMPORAL (frame-axis) attention sub-layer.

The temporal transformer blocks attend over the 14-frame axis per pixel:
x (B, F, S, C) with seq = F tiny and batch = B*S huge. The XLA formulation
(models/transformer._frame_axis_attention) is einsum-based — qkv projection,
(B, N, Fq, Fk, S) fp32 logits, softmax, PV einsum, out projection — which
round-trips HBM between every stage (~0.5 GB of intermediate traffic per L0
instance) and runs its tiny 14x64x14 contractions far off the MXU's
preferred shapes. There are ~23 temporal blocks per denoise step.

Same design as the spatial sub-layer (ops/pallas_qkvt.py, which this module
reuses for kernels 1 and 3):

  kernel 1  ln_qkvt_proj    x (B, F*S, C) -> qkv_t (B, 3C, F*S)
            LayerNorm + fused-QKV matmul with transposed output (MXU).
  kernel 2  _frame_attn_kernel  qkv_t viewed (B, 3C, F, S); one
            (batch, head, s-block) program holds the FULL frame extent for a
            block of pixels and computes the 14x14 per-pixel attention on the
            VPU: logits[i, j, s] = sum_h q[h, i, s] * k[h, j, s] as
            broadcast-multiply + sublane reductions (the contraction is
            per-pixel, so the MXU cannot be used without a gather; at F=14
            the whole chain is ~2.3 GFLOP/step — VPU territory). Softmax is
            exact (full F extent in VMEM), exp2 with log2(e) folded into the
            q scale like every other kernel here.
  kernel 3  out_proj_res     o_t (B, C, F*S) -> (B, F*S, C) with the to_out
            projection transposing back for free and the residual fused.

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

from posetraj_tpu.ops.pallas_qkvt import ln_qkvt_proj, out_proj_res

_LOG2E = 1.4426950408889634


def _frame_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch, head, s-block) program, all refs transposed-packed 4D:
    q_ref/k_ref/v_ref/o_ref (1, H, F, bs). Per-pixel attention over the F
    sublane axis; H rides the (cheap) outer block dim, pixels ride the lanes.
    """
    q = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)  # (H, F, bs)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    f = q.shape[1]

    outs = []
    for i in range(f):  # trace-time unroll, F <= 14 at every SVD config
        q_i = q[:, i : i + 1, :]                      # (H, 1, bs)
        s_i = jnp.sum(q_i * k, axis=0)                # (F, bs) fp32 logits
        m = jnp.max(s_i, axis=0, keepdims=True)       # (1, bs)
        p = jnp.exp2(s_i - m)                         # (F, bs)
        l = jnp.sum(p, axis=0, keepdims=True)         # (1, bs)
        o_i = jnp.sum(p[None, :, :] * v, axis=1)      # (H, bs)
        outs.append(o_i / l)
    o_ref[0] = jnp.stack(outs, axis=1).astype(o_ref.dtype)  # (H, F, bs)


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


@functools.partial(jax.jit, static_argnames=("num_heads", "num_frames", "scale", "interpret"))
def frame_attention_t(qkv_t, num_heads: int, num_frames: int, scale: float,
                      interpret: bool | None = None):
    """qkv_t (B, 3C, F*S) [row-blocks q|k|v, each C = num_heads * H] ->
    o_t (B, C, F*S): per-pixel attention over the frame axis. The (F, S)
    split of the token axis is a free reshape of the packed projection."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d3, fs = qkv_t.shape
    c = d3 // 3
    h = c // num_heads
    n = num_heads
    f = num_frames
    s = fs // f
    bs = frame_block_s(s, h, f)
    assert bs is not None and fs == f * s, (s, f, fs)

    x4 = qkv_t.reshape(b, d3, f, s)
    grid = (b, n, s // bs)
    out = pl.pallas_call(
        functools.partial(_frame_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, f, bs), lambda bi, ni, si: (bi, ni, 0, si)),
            pl.BlockSpec((1, h, f, bs), lambda bi, ni, si: (bi, n + ni, 0, si)),
            pl.BlockSpec((1, h, f, bs), lambda bi, ni, si: (bi, 2 * n + ni, 0, si)),
        ],
        out_specs=pl.BlockSpec((1, h, f, bs), lambda bi, ni, si: (bi, ni, 0, si)),
        out_shape=jax.ShapeDtypeStruct((b, c, f, s), qkv_t.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
        interpret=interpret,
    )(x4, x4, x4)
    return out.reshape(b, c, fs)


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
    flat = x.reshape(b, f * s, c)
    wt = wqkv.astype(x.dtype).T  # (3C, C); loop-invariant, hoisted by XLA
    qkv_t = ln_qkvt_proj(flat, wt, ln_s, ln_b, eps=eps)
    hd = c // num_heads
    o_t = frame_attention_t(qkv_t, num_heads, f, hd**-0.5)
    out = out_proj_res(o_t, wo.astype(x.dtype), bo.astype(x.dtype), flat)
    return out.reshape(b, f, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def temporal_attn_sublayer(x, ln_s, ln_b, wqkv, wo, bo, num_heads: int,
                           eps: float = 1e-5):
    """x (B, F, S, C) -> x + to_out(frame_attention(layer_norm(x))): the full
    pre-norm temporal self-attention sub-layer in three transposed-packed
    Pallas kernels. wqkv (C, 3C) = [Wq|Wk|Wv]."""
    return _fused_impl(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps)


def _tas_fwd(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps):
    return _fused_impl(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps), (
        x, ln_s, ln_b, wqkv, wo, bo)


def _tas_bwd(num_heads, eps, res, ct):
    _, vjp = jax.vjp(lambda *a: _ref_temporal_sublayer(*a, num_heads, eps), *res)
    return vjp(ct)


temporal_attn_sublayer.defvjp(_tas_fwd, _tas_bwd)


def temporal_attn_sublayer_applicable(x, num_heads: int) -> bool:
    """TPU-only; S must tile the pixel-block grid and F*S must tile the
    projection/out-proj kernels (no padding possible in the packed layout)."""
    from posetraj_tpu.configs import kernel_config
    from posetraj_tpu.ops.pallas_qkvt import _pick_block_s

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
    fs = f * s
    # kernels 1/3 block the token axis: a proper 128-aligned divisor must
    # exist (the full-axis fallback of _pick_block_s would put the whole
    # F*S extent in one VMEM block).
    bs = _pick_block_s(fs)
    return (bs < fs or fs <= 1024) and s >= 128
