"""UNetSpatioTemporalConditionControlNet — the SVD video UNet extended to
consume ControlNet residuals.

Rebuild of models/unet_spatio_temporal_condition_controlnet.py:32-504
(architecture per diffusers==0.24.0) as pure functions over a parameter
pytree, channels-last.

Fidelity quirk Q1 (unet...controlnet.py:451-459): the reference merges
ControlNet residuals into the skip tuple INSIDE the down-block loop; because
`zip` truncates to the current tuple length, residual k is re-added once per
remaining down block. Reference checkpoints bake this amplification in, so
`cfg.fidelity_residual_in_loop=True` reproduces it; False gives the stock
diffusers semantics (each residual added exactly once).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from posetraj_tpu.configs import UNetConfig
from posetraj_tpu.core.init import conv_init, norm_init, rsplit
from posetraj_tpu.models.blocks import (
    down_block,
    init_down_block,
    init_mid_block,
    init_up_block,
    mid_block,
    up_block,
)
from posetraj_tpu.models.embeddings import (
    init_timestep_embedding,
    sinusoidal_timestep_embedding,
    timestep_embedding,
)
from posetraj_tpu.ops.primitives import conv2d, group_norm_silu, silu


def init_unet(key: jax.Array, cfg: UNetConfig) -> dict:
    n = cfg.num_levels
    ks = rsplit(key, 2 * n + 6)
    boc = cfg.block_out_channels

    p: dict = {
        "conv_in": conv_init(ks[0], (3, 3, cfg.in_channels, boc[0])),
        "time_embedding": init_timestep_embedding(ks[1], boc[0], cfg.time_embed_dim),
        "add_embedding": init_timestep_embedding(
            ks[2], cfg.projection_class_embeddings_input_dim, cfg.time_embed_dim
        ),
        "down_blocks": [],
        "up_blocks": [],
    }

    out_ch = boc[0]
    for i in range(n):
        in_ch, out_ch = out_ch, boc[i]
        p["down_blocks"].append(
            init_down_block(
                ks[3 + i],
                in_ch,
                out_ch,
                cfg.time_embed_dim,
                cfg.layers_per_block,
                cfg.cross_attention_levels[i],
                cfg.num_attention_heads[i],
                cfg.transformer_layers_per_block,
                cfg.cross_attention_dim,
                add_downsample=(i != n - 1),
            )
        )

    p["mid_block"] = init_mid_block(
        ks[3 + n], boc[-1], cfg.time_embed_dim, cfg.num_attention_heads[-1],
        cfg.transformer_layers_per_block, cfg.cross_attention_dim,
    )

    rev_boc = list(reversed(boc))
    rev_heads = list(reversed(cfg.num_attention_heads))
    rev_cross = list(reversed(cfg.cross_attention_levels))
    out_ch = rev_boc[0]
    for i in range(n):
        prev_out, out_ch = out_ch, rev_boc[i]
        in_ch = rev_boc[min(i + 1, n - 1)]
        p["up_blocks"].append(
            init_up_block(
                ks[4 + n + i],
                in_ch,
                prev_out,
                out_ch,
                cfg.time_embed_dim,
                cfg.layers_per_block + 1,
                rev_cross[i],
                rev_heads[i],
                cfg.transformer_layers_per_block,
                cfg.cross_attention_dim,
                add_upsample=(i != n - 1),
            )
        )

    p["conv_norm_out"] = norm_init(boc[0])
    p["conv_out"] = conv_init(ks[-1], (3, 3, boc[0], cfg.out_channels))
    return p


def compute_embeddings(
    params: dict,
    cfg: UNetConfig,
    timestep: jax.Array,
    added_time_ids: jax.Array,
    batch_size: int,
    num_frames: int,
    compute_dtype,
) -> jax.Array:
    """Time + added-condition embedding, repeated per frame: (B*F, temb_dim).

    Mirrors unet...controlnet.py:404-424.
    """
    timesteps = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(timestep)), (batch_size,))
    t_emb = sinusoidal_timestep_embedding(timesteps, cfg.block_out_channels[0])
    emb = timestep_embedding(params["time_embedding"], t_emb.astype(compute_dtype), compute_dtype)

    time_embeds = sinusoidal_timestep_embedding(
        added_time_ids.reshape(-1), cfg.addition_time_embed_dim
    ).reshape(batch_size, -1)
    aug_emb = timestep_embedding(params["add_embedding"], time_embeds.astype(compute_dtype), compute_dtype)
    emb = emb + aug_emb
    return jnp.repeat(emb, num_frames, axis=0)


def unet_forward(
    params: dict,
    cfg: UNetConfig,
    sample: jax.Array,
    timestep: jax.Array,
    encoder_hidden_states: jax.Array,
    added_time_ids: jax.Array,
    down_block_residuals: Optional[Tuple[jax.Array, ...]] = None,
    mid_block_residual: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    attention_backend: str = "auto",
    remat: bool = False,
) -> jax.Array:
    """Denoise one (CFG-expanded) batch of video latents.

    sample: (B, F, H, W, C_in=8) channels-last (noisy latents ++ cond-image
    latents, concatenated by the caller as in pipeline...controlnet.py:537).
    encoder_hidden_states: (B, 1, cross_dim) CLIP image embedding.
    added_time_ids: (B, 3).
    Returns (B, F, H, W, out_channels).
    """
    b, f, h, w, _ = sample.shape
    emb = compute_embeddings(params, cfg, timestep, added_time_ids, b, f, compute_dtype)
    context = jnp.repeat(encoder_hidden_states.astype(compute_dtype), f, axis=0)

    # Rematerialization — the jax.checkpoint equivalent of the reference's
    # --gradient_checkpointing (train...blender_14.py:975-976). remat=True
    # checkpoints whole blocks; remat="unit" pushes the boundary down to each
    # (resnet, transformer) unit inside the blocks (blocks.py down_block
    # docstring) — the flagship 320x576 recipe needs the finer granularity to
    # fit 16 GB HBM.
    units = remat == "unit"
    ckpt = (lambda fn: jax.checkpoint(fn)) if (remat and not units) else (lambda fn: fn)

    x = sample.reshape(b * f, h, w, sample.shape[-1]).astype(compute_dtype)
    x = conv2d(params["conv_in"], x, compute_dtype=compute_dtype)

    image_only_indicator = jnp.zeros((b, f), jnp.float32)

    skips: Tuple[jax.Array, ...] = (x,)
    for i, db_params in enumerate(params["down_blocks"]):
        x, new_skips = ckpt(
            lambda p, xx, ee, cc, _i=i: down_block(
                p, xx, ee, cc, f, cfg.num_attention_heads[_i], image_only_indicator,
                backend=attention_backend, compute_dtype=compute_dtype,
                remat_units=units,
            )
        )(db_params, x, emb, context if cfg.cross_attention_levels[i] else None)
        skips = skips + new_skips
        if down_block_residuals is not None and cfg.fidelity_residual_in_loop:
            # Q1: in-loop merge; zip truncates to current length so earlier
            # residuals accumulate again on every later iteration (:451-459).
            skips = tuple(s + r.astype(s.dtype) for s, r in zip(skips, down_block_residuals))

    if down_block_residuals is not None and not cfg.fidelity_residual_in_loop:
        skips = tuple(s + r.astype(s.dtype) for s, r in zip(skips, down_block_residuals))

    x = ckpt(
        lambda p, xx, ee, cc: mid_block(
            p, xx, ee, cc, f, cfg.num_attention_heads[-1], image_only_indicator,
            backend=attention_backend, compute_dtype=compute_dtype,
            remat_units=units,
        )
    )(params["mid_block"], x, emb, context)
    if mid_block_residual is not None:
        x = x + mid_block_residual.astype(x.dtype)

    rev_heads = list(reversed(cfg.num_attention_heads))
    rev_cross = list(reversed(cfg.cross_attention_levels))
    n_res = cfg.layers_per_block + 1
    for i, ub_params in enumerate(params["up_blocks"]):
        block_skips, skips = skips[-n_res:], skips[:-n_res]
        x = ckpt(
            lambda p, xx, ss, ee, cc, _i=i: up_block(
                p, xx, ss, ee, cc, f, rev_heads[_i], image_only_indicator,
                backend=attention_backend, compute_dtype=compute_dtype,
                remat_units=units,
            )
        )(ub_params, x, block_skips, emb, context if rev_cross[i] else None)

    x = group_norm_silu(params["conv_norm_out"], x, eps=1e-5)
    x = conv2d(params["conv_out"], x, compute_dtype=compute_dtype)
    return x.reshape(b, f, h, w, cfg.out_channels)
