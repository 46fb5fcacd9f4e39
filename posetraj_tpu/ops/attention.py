"""Scaled-dot-product attention core with pluggable backends.

The reference leans on torch/xformers SDPA (train_svd_traj_blender_14.py:925-937);
here the default backend is XLA (fused on TPU via Mosaic-friendly einsums with
fp32 softmax), with a Pallas flash-attention backend for the spatial-token hot
path (posetraj_tpu/ops/pallas_attention.py). The SVD workload has two very
different shapes (SURVEY.md section 3.4):

  * spatial attention: seq = h*w tokens (720..9216), batch = B*F
  * temporal attention: seq = num_frames (14), batch = B*H*W (huge)

Both route through this entry point; the backend picks per-shape strategy.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """(B, S, N, H) attention with fp32 logits/softmax."""
    logits = jnp.einsum("bqnh,bknh->bnqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum("bnqk,bknh->bqnh", probs.astype(q.dtype), v, preferred_element_type=q.dtype)
    return out


def self_attention_qkv(
    qkv: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jax.Array:
    """Self-attention on the fused-QKV projection output (B, S, 3C) -> (B, S, C).

    On the TPU spatial hot path this feeds the packed Pallas kernel, whose
    BlockSpec index maps slice per-head q/k/v tiles straight out of the
    projection — the q/k/v split, the head fold, and the kernel-layout
    transposes never touch HBM (round-2 trace: ~130 ms/step of pure layout
    copies, PERF.md roadmap #3). Everywhere else it splits and takes the
    generic path."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // num_heads
    if scale is None:
        scale = head_dim**-0.5
    if (
        backend in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and s >= 512
        and head_dim % 128 == 0  # Mosaic: lane-dim blocks must be 128-aligned
        and head_dim <= 128
    ):
        from posetraj_tpu.ops.pallas_attention import flash_attention_qkv, qkv_blocks

        if qkv_blocks(s) is not None:
            return flash_attention_qkv(qkv, num_heads, scale)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return attention(q, k, v, num_heads, scale, backend=backend)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
    backend: str = "auto",
    gather_kv_axis: Optional[str] = None,
) -> jax.Array:
    """Multi-head SDPA over flat (B, S, D_model) q and (B, S_kv, D_model) k/v.

    Returns (B, S, D_model). `backend`: "auto" | "xla" | "pallas".

    gather_kv_axis: mesh axis name for W-sharded serving (parallel/spmd.py):
    k/v arrive token-sharded and are all-gathered over that axis so each chip
    runs its local query rows against the full token extent. Softmax over K
    is permutation-invariant, so the shard-order concatenation is exact.
    """
    if gather_kv_axis is not None:
        k = jax.lax.all_gather(k, gather_kv_axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, gather_kv_axis, axis=1, tiled=True)

    b, sq, d = q.shape
    skv = k.shape[1]
    head_dim = d // num_heads
    if scale is None:
        scale = head_dim**-0.5
    qh = q.reshape(b, sq, num_heads, head_dim)
    kh = k.reshape(b, skv, num_heads, head_dim)
    vh = v.reshape(b, skv, num_heads, head_dim)

    if backend == "auto":
        # Pallas flash attention pays off for long spatial sequences on TPU;
        # tiny-seq (temporal, 14 tokens) and cross-attn (kv_len=1) stay XLA.
        # Rectangular (gathered-KV serving: skv = n_shards * sq) qualifies.
        backend = "xla"
        if (
            jax.default_backend() == "tpu"
            and sq >= 512
            and skv >= sq
            and head_dim % 64 == 0
            and head_dim <= 128  # MXU-aligned; big-head (VAE) stays XLA
        ):
            backend = "pallas"

    if backend == "pallas":
        # Transposed-accumulator kernel: at head_dim 64 the PV matmul runs at
        # full MXU width (see pallas_attention._flash_kernel_tq). v5e-measured
        # vs the natural layout: S=9216 61->79 TF/s, S=2304 26->32 TF/s.
        # flash_attention_diff wraps it with a blockwise Pallas backward
        # (custom_vjp), so the same dispatch serves training.
        from posetraj_tpu.ops.pallas_attention import flash_attention_diff

        # Block sizes from in-graph (fori_loop-delta) sweeps on v5e: long
        # sequences favor (1024, 1024); mid-range sequences run the WHOLE
        # K extent as one block (exact softmax fast path, no online-rescale
        # VPU work) with the q block sized so the fp32 logits fit scoped
        # VMEM — S=2304: (1152, 2304) measured 4.18 ms vs 7.48 for
        # (512, 512). Short sequences clamp to a single block either way.
        # Keyed on the K extent (the loop dimension), which differs from sq
        # in the gathered-KV serving path.
        if skv >= 4096:
            bq, bk = 1024, 1024
        elif skv >= 1024:
            bk = -(-skv // 128) * 128  # single K block over the padded seq
            bq = max(128, min(1280, (11_000_000 // (4 * bk)) & ~127))
        else:
            bq, bk = 1024, 1024  # both clamp to the padded sequence => 1 block
        out = flash_attention_diff(qh, kh, vh, scale, bq, bk)
    else:
        out = _xla_attention(qh, kh, vh, scale)
    return out.reshape(b, sq, d)
