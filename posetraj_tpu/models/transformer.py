"""Spatial + temporal transformer blocks and the TransformerSpatioTemporalModel.

Architecture per diffusers==0.24.0 (attention.py BasicTransformerBlock /
TemporalBasicTransformerBlock, transformer_temporal.py
TransformerSpatioTemporalModel) — the exact version the reference pins
(requirements.txt:4) and consumes via unet_3d_blocks.

Shapes: spatial tokens (B*F, H*W, C); temporal tokens (B*H*W, F, C). The
temporal shape is tiny-seq/huge-batch — attention backend dispatch lives in
posetraj_tpu/ops/attention.py.

Fidelity quirk Q7 (discovered during the rebuild, preserved behind
`fidelity_time_context_order`): diffusers 0.24.0 builds the temporal
cross-attn `time_context` by broadcasting to (H*W, B, 1, C) then reshaping to
(H*W*B, 1, C) — sequence-major — while the hidden states it attends from are
batch-major (B*H*W, F, C). For batch==1 (single video, no CFG) the orderings
coincide; for the CFG batch of 2 the cond/uncond contexts interleave across
pixels. Reference checkpoints were trained and evaluated through this code
path, so it defaults on.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from posetraj_tpu.core.init import linear_init, norm_init, rsplit
from posetraj_tpu.models.embeddings import (
    init_timestep_embedding,
    sinusoidal_timestep_embedding,
    timestep_embedding,
)
from posetraj_tpu.ops.attention import attention, self_attention_qkv
from posetraj_tpu.ops.primitives import geglu, group_norm_silu, layer_norm, linear

# ---------------------------------------------------------------------------
# Attention projections (diffusers Attention, default config for SVD:
# qkv bias False, out bias True)
# ---------------------------------------------------------------------------


def init_attention(
    key: jax.Array,
    query_dim: int,
    heads: int,
    cross_attention_dim: Optional[int] = None,
    inner_dim: Optional[int] = None,
    qkv_bias: bool = False,
    out_bias: bool = True,
) -> dict:
    inner = inner_dim or query_dim
    kv_dim = cross_attention_dim or query_dim
    ks = rsplit(key, 4)
    return {
        "to_q": linear_init(ks[0], query_dim, inner, use_bias=qkv_bias),
        "to_k": linear_init(ks[1], kv_dim, inner, use_bias=qkv_bias),
        "to_v": linear_init(ks[2], kv_dim, inner, use_bias=qkv_bias),
        "to_out": linear_init(ks[3], inner, query_dim, use_bias=out_bias),
    }


def attention_module(
    params: dict,
    x: jax.Array,
    num_heads: int,
    context: Optional[jax.Array] = None,
    backend: str = "auto",
    compute_dtype=None,
) -> jax.Array:
    # W-sharded serving (parallel/spmd.py): self-attention tokens are a shard
    # of the global H*W extent — K/V all-gather over the shard axis inside
    # attention(). Cross-attention context (the length-1 CLIP embedding) is
    # replicated, so it never gathers.
    from posetraj_tpu.parallel import spmd

    ctx_sp = spmd.current()
    # tokens_sharded: replicated deep levels (SpmdCtx.replicated_s) hold the
    # full token extent locally and must not gather.
    gather_axis = (
        ctx_sp.sp_axis
        if (ctx_sp is not None and context is None and ctx_sp.tokens_sharded(x.shape[1]))
        else None
    )
    if context is None and "bias" not in params["to_q"]:
        # Self-attention: one (C, 3C) matmul instead of three (C, C) ones —
        # wider output lanes use the MXU better at C=320 (960 pads to 1024 vs
        # 3x 384) and two dispatch/fusion boundaries disappear. The concat of
        # loop-invariant weights is hoisted out of the denoise scan by XLA.
        dt = compute_dtype or x.dtype
        wqkv = jnp.concatenate(
            [params["to_q"]["kernel"], params["to_k"]["kernel"], params["to_v"]["kernel"]],
            axis=1,
        ).astype(dt)
        qkv = jnp.dot(x.astype(dt), wqkv, preferred_element_type=dt)
        if gather_axis is None:
            # Packed path: the flash kernel reads per-head tiles straight out
            # of the projection output (ops/attention.self_attention_qkv).
            out = self_attention_qkv(qkv, num_heads, backend=backend)
            return linear(params["to_out"], out, compute_dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        ctx = context if context is not None else x
        if context is not None and context.shape[1] == 1:
            # Single-token cross-attention (the CLIP embedding): softmax over
            # one key is identically 1, so the output is exactly v broadcast
            # over every query — skip q/k projections and the attention
            # entirely. Returned as (B, 1, C); the caller's residual add
            # broadcasts it over the token axis.
            v = linear(params["to_v"], ctx, compute_dtype)
            return linear(params["to_out"], v, compute_dtype)
        q = linear(params["to_q"], x, compute_dtype)
        k = linear(params["to_k"], ctx, compute_dtype)
        v = linear(params["to_v"], ctx, compute_dtype)
    out = attention(q, k, v, num_heads, backend=backend, gather_kv_axis=gather_axis)
    return linear(params["to_out"], out, compute_dtype)


# ---------------------------------------------------------------------------
# FeedForward (GEGLU)
# ---------------------------------------------------------------------------


def init_feed_forward(key: jax.Array, dim: int, dim_out: Optional[int] = None, mult: int = 4) -> dict:
    inner = dim * mult
    k1, k2 = rsplit(key)
    return {
        "proj_in": linear_init(k1, dim, inner * 2),  # GEGLU fused proj
        "proj_out": linear_init(k2, inner, dim_out or dim),
    }


def feed_forward(params: dict, x: jax.Array, compute_dtype=None, norm: Optional[dict] = None,
                 residual: bool = False, add: Optional[jax.Array] = None) -> jax.Array:
    """GEGLU FF, optionally with the preceding LayerNorm fused in (`norm` =
    the LN params) and the pre-norm residual add fused on (`residual=True`
    returns x + ff(ln(x))) — the block's full FF sub-layer in one kernel.

    On TPU at production shapes this dispatches to the fused Pallas MLP
    kernel (ops/pallas_mlp.py): the gated intermediate stays in VMEM instead
    of round-tripping HBM (in-graph v5e: L0 8.4->6.0 ms, L1 5.7->4.0, L2
    4.5->3.5 per FF), and the fused LN removes the norm's separate
    read+write+fp32-temp pass. Gradients route through the plain XLA
    formulation (custom_vjp), so training is exact.

    add: optional broadcast vector pre-added to x (the single-token
    cross-attention fast-path output — a (..., 1, C) shape broadcastable
    against x). The fused residual path folds it into the kernel, deleting
    the standalone broadcast-add HBM pass; every other path adds it
    explicitly (identical math)."""
    from posetraj_tpu.ops.pallas_mlp import (
        fused_geglu_applicable,
        fused_geglu_mlp,
        fused_ln_geglu_mlp,
        fused_ln_geglu_mlp_res,
        fused_ln_geglu_mlp_res_add,
        mlp_addend_foldable,
    )
    from posetraj_tpu.configs import kernel_config

    add3 = None
    if add is not None:
        # canonical (G, S_a, C): axes before the last broadcast (==1) axis
        # are group dims, axes after it are the shared inner extent.
        # (B*F, 1, C) / (B, F, 1, C) -> (G, 1, C); (B, 1, S, C) -> (B, S, C).
        ones = [i for i, d in enumerate(add.shape[:-1]) if d == 1]
        cut = ones[-1] if ones else len(add.shape) - 1
        g = 1
        for d in add.shape[:cut]:
            g *= d
        add3 = add.reshape(g, -1, add.shape[-1])
    w1 = params["proj_in"]["kernel"]
    if fused_geglu_applicable(x, w1):
        dt = compute_dtype or x.dtype
        k = w1.shape[0]
        fold = (
            add3 is not None
            and norm is not None
            and residual
            and x.shape[-1] == params["proj_out"]["kernel"].shape[1]
            and kernel_config().fused_ff_ln
            and mlp_addend_foldable(x, add3)
        )
        if add is not None and not fold:
            x = x + add.astype(x.dtype)
        flat = x.reshape(-1, k).astype(dt)
        args = (
            w1.astype(dt),
            params["proj_in"]["bias"].astype(dt),
            params["proj_out"]["kernel"].astype(dt),
            params["proj_out"]["bias"].astype(dt),
        )
        if norm is not None and kernel_config().fused_ff_ln:
            if residual and x.shape[-1] == params["proj_out"]["kernel"].shape[1]:
                if fold:
                    out = fused_ln_geglu_mlp_res_add(
                        flat, norm["scale"], norm["bias"], *args, add3.astype(dt)
                    )
                else:
                    out = fused_ln_geglu_mlp_res(flat, norm["scale"], norm["bias"], *args)
                return out.reshape(*x.shape[:-1], out.shape[-1])
            out = fused_ln_geglu_mlp(flat, norm["scale"], norm["bias"], *args)
        else:
            if norm is not None:
                flat = layer_norm(norm, flat).astype(dt)
            out = fused_geglu_mlp(flat, *args)
        out = out.reshape(*x.shape[:-1], out.shape[-1])
        return x + out if residual else out
    if add is not None:
        x = x + add.astype(x.dtype)
    if norm is not None:
        h = layer_norm(norm, x)
    else:
        h = x
    out = linear(params["proj_out"], geglu(params["proj_in"], h, compute_dtype), compute_dtype)
    return x + out if residual else out


# ---------------------------------------------------------------------------
# BasicTransformerBlock (spatial: self-attn + cross-attn + GEGLU FF)
# ---------------------------------------------------------------------------


def init_basic_transformer_block(
    key: jax.Array,
    dim: int,
    num_heads: int,
    cross_attention_dim: Optional[int],
) -> dict:
    ks = rsplit(key, 3)
    p = {
        "norm1": norm_init(dim),
        "attn1": init_attention(ks[0], dim, num_heads),
        "norm3": norm_init(dim),
        "ff": init_feed_forward(ks[2], dim),
    }
    if cross_attention_dim is not None:
        p["norm2"] = norm_init(dim)
        p["attn2"] = init_attention(ks[1], dim, num_heads, cross_attention_dim=cross_attention_dim)
    return p


def basic_transformer_block(
    params: dict,
    x: jax.Array,
    num_heads: int,
    context: Optional[jax.Array] = None,
    backend: str = "auto",
    compute_dtype=None,
) -> jax.Array:
    from posetraj_tpu.ops.pallas_qkvt import attn_sublayer, attn_sublayer_applicable
    from posetraj_tpu.parallel import spmd

    a1 = params["attn1"]
    if (
        backend in ("auto", "pallas")
        and all("bias" not in a1[k] for k in ("to_q", "to_k", "to_v"))
        and spmd.current() is None  # sharded serving gathers K/V inside attention()
        and attn_sublayer_applicable(x, num_heads)
    ):
        # Transposed-packed sub-layer (ops/pallas_qkvt.py): norm1 + fused QKV
        # projection + flash attention + to_out + residual in three Pallas
        # kernels with zero HBM layout traffic between them.
        dt = compute_dtype or x.dtype
        wqkv = jnp.concatenate(
            [a1["to_q"]["kernel"], a1["to_k"]["kernel"], a1["to_v"]["kernel"]], axis=1
        ).astype(dt)
        x = attn_sublayer(
            x.astype(dt), params["norm1"]["scale"], params["norm1"]["bias"],
            wqkv, a1["to_out"]["kernel"].astype(dt), a1["to_out"]["bias"].astype(dt),
            num_heads,
        )
    else:
        h = layer_norm(params["norm1"], x)
        x = x + attention_module(a1, h, num_heads, backend=backend, compute_dtype=compute_dtype)
    add = None
    if "attn2" in params:
        h = layer_norm(params["norm2"], x)
        att = attention_module(
            params["attn2"], h, num_heads, context=context, backend=backend, compute_dtype=compute_dtype
        )
        if att.shape != x.shape:
            # Single-token fast path returned a broadcast vector (B*F, 1, C):
            # fold its residual add into the FF kernel (feed_forward add=).
            add = att
        else:
            x = x + att
    return feed_forward(params["ff"], x, compute_dtype, norm=params["norm3"], residual=True,
                        add=add)


# ---------------------------------------------------------------------------
# TemporalBasicTransformerBlock (attention over the frame axis per pixel)
# ---------------------------------------------------------------------------


def init_temporal_basic_transformer_block(
    key: jax.Array,
    dim: int,
    num_heads: int,
    cross_attention_dim: Optional[int],
) -> dict:
    # time_mix_inner_dim == dim in SVD, so is_res is always True.
    ks = rsplit(key, 4)
    p = {
        "norm_in": norm_init(dim),
        "ff_in": init_feed_forward(ks[0], dim),
        "norm1": norm_init(dim),
        "attn1": init_attention(ks[1], dim, num_heads),
        "norm3": norm_init(dim),
        "ff": init_feed_forward(ks[3], dim),
    }
    if cross_attention_dim is not None:
        p["norm2"] = norm_init(dim)
        p["attn2"] = init_attention(ks[2], dim, num_heads, cross_attention_dim=cross_attention_dim)
    return p


def _frame_axis_attention(
    params: dict,
    x: jax.Array,
    num_heads: int,
    context: Optional[jax.Array] = None,
    compute_dtype=None,
) -> jax.Array:
    """Attention over the FRAME axis of (B, F, S, C) without materializing the
    (B*S, F, C) transpose the torch layout forces — the per-pixel token count
    (S up to 9216) makes those transposes pure HBM traffic. Frame attention is
    tiny-seq (F=14) so logits stay small: (B, S, N, F, F_kv).

    context: optional (B, S, 1, C_kv) per-pixel cross-attn context."""
    b, f, s, c = x.shape
    hd = c // num_heads
    if context is not None and context.shape[1] == 1:
        # Single-frame cross-attention context (the per-pixel CLIP token):
        # softmax over one key is identically 1 — the output is exactly
        # to_out(to_v(context)), broadcast over the frame axis by the
        # caller's residual add. Skips q/k and the einsum chain.
        v = linear(params["to_v"], context, compute_dtype)  # (B, 1, S, C)
        return linear(params["to_out"], v, compute_dtype)
    if context is None and "bias" not in params["to_q"]:
        dt = compute_dtype or x.dtype
        wqkv = jnp.concatenate(
            [params["to_q"]["kernel"], params["to_k"]["kernel"], params["to_v"]["kernel"]],
            axis=1,
        ).astype(dt)
        qkv = jnp.dot(x.astype(dt), wqkv, preferred_element_type=dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, f, s, num_heads, hd)
    else:
        q = linear(params["to_q"], x, compute_dtype).reshape(b, f, s, num_heads, hd)
        ctx = x if context is None else context
        k = linear(params["to_k"], ctx, compute_dtype)
        v = linear(params["to_v"], ctx, compute_dtype)
    fk = k.shape[1]
    k = k.reshape(b, fk, s, num_heads, hd)
    v = v.reshape(b, fk, s, num_heads, hd)
    # Logits laid out (B, N, Fq, Fk, S): S in the LANE dim. The natural
    # (..., Fq, Fk) order pads both frame axes to the (8, 128) tile —
    # f32[2,9216,5,14,14] ballooned to ~755 MB physical (14 -> 128 lanes) in
    # the device trace; with S minor it is ~82 MB and softmax reduces over
    # the sublane-tiled Fk axis.
    logits = jnp.einsum("bqsnh,bksnh->bnqks", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * (hd**-0.5), axis=3)
    out = jnp.einsum("bnqks,bksnh->bqsnh", probs.astype(q.dtype), v, preferred_element_type=q.dtype)
    return linear(params["to_out"], out.reshape(b, f, s, c), compute_dtype)


def temporal_basic_transformer_block(
    params: dict,
    x: jax.Array,
    num_frames: int,
    num_heads: int,
    context: Optional[jax.Array] = None,
    compute_dtype=None,
    add: Optional[jax.Array] = None,
) -> jax.Array:
    """x: (B*F, S, C) -> same; math identical to the torch block but computed
    in the (B, F, S, C) layout (see _frame_axis_attention).

    context: optional per-pixel cross context shaped (B, F_kv, S, C_kv).
    add: optional (B*F, 1, C) broadcast vector pre-added to x — the
    frame-position embedding the caller mixes in before each temporal block
    (transformer_spatio_temporal's `h + emb`); folded into ff_in's kernel."""
    bf, s, c = x.shape
    b = bf // num_frames
    x = x.reshape(b, num_frames, s, c)

    # is_res (dim == time_mix_inner_dim in SVD): residual fused into the FF
    x = feed_forward(params["ff_in"], x, compute_dtype, norm=params["norm_in"], residual=True,
                     add=add.reshape(b, num_frames, 1, c) if add is not None else None)

    from posetraj_tpu.ops.pallas_temporal import (
        temporal_attn_sublayer,
        temporal_attn_sublayer_applicable,
    )
    from posetraj_tpu.parallel import spmd

    a1 = params["attn1"]
    if (
        all("bias" not in a1[k] for k in ("to_q", "to_k", "to_v"))
        and spmd.current() is None  # sharded serving keeps the einsum path
        and temporal_attn_sublayer_applicable(x, num_heads)
    ):
        # Transposed-packed temporal sub-layer (ops/pallas_temporal.py):
        # norm1 + fused QKV + per-pixel frame attention + to_out + residual
        # in three Pallas kernels — the einsum chain's HBM round-trips gone.
        dt = compute_dtype or x.dtype
        wqkv = jnp.concatenate(
            [a1["to_q"]["kernel"], a1["to_k"]["kernel"], a1["to_v"]["kernel"]], axis=1
        ).astype(dt)
        x = temporal_attn_sublayer(
            x.astype(dt), params["norm1"]["scale"], params["norm1"]["bias"],
            wqkv, a1["to_out"]["kernel"].astype(dt), a1["to_out"]["bias"].astype(dt),
            num_heads,
        )
    else:
        h = layer_norm(params["norm1"], x)
        x = x + _frame_axis_attention(a1, h, num_heads, compute_dtype=compute_dtype)
    add = None
    if "attn2" in params:
        h = layer_norm(params["norm2"], x)
        att = _frame_axis_attention(
            params["attn2"], h, num_heads, context=context, compute_dtype=compute_dtype
        )
        if att.shape != x.shape:
            # Per-pixel single-frame fast path returned (B, 1, S, C): fold
            # its residual add into the FF kernel (feed_forward add=).
            add = att
        else:
            x = x + att
    x = feed_forward(params["ff"], x, compute_dtype, norm=params["norm3"], residual=True,
                     add=add)

    return x.reshape(bf, s, c)


# ---------------------------------------------------------------------------
# TransformerSpatioTemporalModel
# ---------------------------------------------------------------------------


def init_transformer_spatio_temporal(
    key: jax.Array,
    in_channels: int,
    num_heads: int,
    num_layers: int,
    cross_attention_dim: Optional[int],
) -> dict:
    ks = rsplit(key, 2 * num_layers + 3)
    p = {
        "norm": norm_init(in_channels),
        "proj_in": linear_init(ks[0], in_channels, in_channels),
        "blocks": [
            init_basic_transformer_block(ks[1 + i], in_channels, num_heads, cross_attention_dim)
            for i in range(num_layers)
        ],
        "temporal_blocks": [
            init_temporal_basic_transformer_block(
                ks[1 + num_layers + i], in_channels, num_heads, cross_attention_dim
            )
            for i in range(num_layers)
        ],
        "time_pos_embed": init_timestep_embedding(
            ks[-2], in_channels, in_channels * 4, out_dim=in_channels
        ),
        "time_mixer": {"mix_factor": jnp.asarray([0.5], jnp.float32)},
        "proj_out": linear_init(ks[-1], in_channels, in_channels),
    }
    return p


def transformer_spatio_temporal(
    params: dict,
    x: jax.Array,
    context: jax.Array,
    num_frames: int,
    num_heads: int,
    image_only_indicator: Optional[jax.Array] = None,
    fidelity_time_context_order: bool = True,
    backend: str = "auto",
    compute_dtype=None,
) -> jax.Array:
    """x: (B*F, H, W, C); context: (B*F, 1, cross_dim) CLIP embedding.

    norm -> proj_in -> [spatial block -> (+frame-pos emb) -> temporal block ->
    AlphaBlender] x L -> proj_out -> +residual
    (diffusers 0.24.0 TransformerSpatioTemporalModel.forward).
    """
    bf, hh, ww, c = x.shape
    b = bf // num_frames
    s = hh * ww

    # Temporal cross-attn context: first-frame CLIP embedding per video,
    # shaped (B, 1, S, D) for the frame-axis attention layout.
    ctx_first = context.reshape(b, num_frames, -1, context.shape[-1])[:, 0]  # (B, 1, D)
    if fidelity_time_context_order:
        # Q7 (diffusers 0.24.0): the flat (H*W*B) context is sequence-major
        # while hidden rows are batch-major, so pixel (b, s) reads entry
        # (b*S + s) % B — for the CFG batch of 2 the cond/uncond contexts
        # INTERLEAVE across pixels. Reproduce via gather on the (B,) table.
        #
        # Under sharded serving (parallel/spmd.py) both the batch rows (cfg
        # axis) and the token positions (sp axis) are shards of global
        # extents: the modulo must use global indices, and the interleave
        # needs the OTHER cfg branch's context row — all-gather the tiny
        # (b, 1, D) table over "cfg" (B*D floats; the hidden states never
        # move).
        from posetraj_tpu.parallel import spmd

        ctx_sp = spmd.current()
        # At replicated deep levels (SpmdCtx.replicated_h) the local W IS the
        # global W: no sp offset, but the cfg interleave still applies.
        sp_here = ctx_sp is not None and ctx_sp.w_sharded_at(hh)
        if ctx_sp is not None and (sp_here or ctx_sp.cfg_size > 1):
            table = ctx_first
            b_glob, b_ids = b, jnp.arange(b)
            if ctx_sp.cfg_size > 1:
                table = jax.lax.all_gather(ctx_first, ctx_sp.cfg_axis, axis=0, tiled=True)
                b_glob = b * ctx_sp.cfg_size
                b_ids = jax.lax.axis_index(ctx_sp.cfg_axis) * b + jnp.arange(b)
            w_glob = ww * ctx_sp.sp_size if sp_here else ww
            col = jax.lax.axis_index(ctx_sp.sp_axis) * ww + jnp.arange(ww) \
                if sp_here else jnp.arange(ww)
            s_glob = (jnp.arange(hh)[:, None] * w_glob + col[None, :]).reshape(-1)  # (s,)
            flat_idx = (b_ids[:, None] * (hh * w_glob) + s_glob[None, :]) % b_glob
            time_context = table[flat_idx]  # (b, S, 1, D)
        else:
            flat_idx = (jnp.arange(b)[:, None] * s + jnp.arange(s)[None, :]) % b  # (B, S)
            time_context = ctx_first[flat_idx]  # (B, S, 1, D)
        time_context = time_context.transpose(0, 2, 1, 3)  # (B, 1, S, D)
    else:
        time_context = jnp.broadcast_to(ctx_first[:, :, None, :], (b, 1, s, ctx_first.shape[-1]))

    residual = x
    h = group_norm_silu(params["norm"], x, eps=1e-6, act=False)
    h = h.reshape(bf, s, c)
    h = linear(params["proj_in"], h, compute_dtype)

    # Frame-position embedding added before each temporal block.
    frame_ids = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32), (b,))  # (B*F,)
    t_emb = sinusoidal_timestep_embedding(frame_ids, c)
    emb = timestep_embedding(params["time_pos_embed"], t_emb.astype(h.dtype), compute_dtype)
    emb = emb[:, None, :]

    for block_p, tblock_p in zip(params["blocks"], params["temporal_blocks"]):
        h = basic_transformer_block(
            block_p, h, num_heads, context=context, backend=backend, compute_dtype=compute_dtype
        )
        # emb (B*F, 1, C) rides the temporal block's ff_in kernel as a folded
        # addend instead of a standalone h + emb broadcast pass.
        h_mix = temporal_basic_transformer_block(
            tblock_p, h, num_frames, num_heads, context=time_context, compute_dtype=compute_dtype,
            add=emb,
        )
        from posetraj_tpu.models.resnet import alpha_blend

        h = alpha_blend(
            params["time_mixer"], h, h_mix, image_only_indicator, merge_strategy="learned_with_images"
        )

    h = linear(params["proj_out"], h, compute_dtype)
    return h.reshape(bf, hh, ww, c) + residual
