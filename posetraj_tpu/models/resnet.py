"""Residual blocks: spatial 2D, temporal (frame-axis conv), and the blended
spatio-temporal block with AlphaBlender.

Architecture per diffusers==0.24.0 resnet.py (ResnetBlock2D,
TemporalResnetBlock, SpatioTemporalResBlock, AlphaBlender), which the reference
consumes via unet_3d_blocks (unet_spatio_temporal_condition_controlnet.py:13).
Layout: spatial tensors (N, H, W, C); temporal tensors (B, F, H, W, C).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from posetraj_tpu.core.init import conv_init, linear_init, norm_init, rsplit
from posetraj_tpu.ops.primitives import conv2d, conv3d_temporal, group_norm_silu, linear, silu


# ---------------------------------------------------------------------------
# ResnetBlock2D
# ---------------------------------------------------------------------------

def init_resnet_block_2d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    temb_channels: Optional[int],
) -> dict:
    ks = rsplit(key, 4)
    p = {
        "norm1": norm_init(in_channels),
        "conv1": conv_init(ks[0], (3, 3, in_channels, out_channels)),
        "norm2": norm_init(out_channels),
        "conv2": conv_init(ks[1], (3, 3, out_channels, out_channels)),
    }
    if temb_channels:
        p["time_emb_proj"] = linear_init(ks[2], temb_channels, out_channels)
    if in_channels != out_channels:
        p["conv_shortcut"] = conv_init(ks[3], (1, 1, in_channels, out_channels))
    return p


def resnet_block_2d(
    params: dict,
    x: jax.Array,
    temb: Optional[jax.Array] = None,
    eps: float = 1e-5,
    compute_dtype=None,
) -> jax.Array:
    """(N, H, W, C) -> (N, H, W, C_out). temb: (N, temb_dim).

    diffusers ResnetBlock2D default path: norm-silu-conv, +temb, norm-silu-conv,
    +skip (output_scale_factor 1).
    """
    h = group_norm_silu(params["norm1"], x, eps=eps)
    h = conv2d(params["conv1"], h, compute_dtype=compute_dtype)
    t = None
    if temb is not None and "time_emb_proj" in params:
        # (N, C) time-emb broadcast folded into norm2's Pallas kernels
        # (group_norm_silu add=): the standalone h + t[:, None, None, :]
        # pass over the (N, H, W, C) activation disappears.
        t = linear(params["time_emb_proj"], silu(temb), compute_dtype)
    h = group_norm_silu(params["norm2"], h, eps=eps, add=t)
    h = conv2d(params["conv2"], h, compute_dtype=compute_dtype)
    if "conv_shortcut" in params:
        x = conv2d(params["conv_shortcut"], x, compute_dtype=compute_dtype)
    return x + h


# ---------------------------------------------------------------------------
# TemporalResnetBlock — 3D convs with kernel (3,1,1): pure frame mixing
# ---------------------------------------------------------------------------

def init_temporal_resnet_block(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    temb_channels: Optional[int],
) -> dict:
    ks = rsplit(key, 4)
    p = {
        "norm1": norm_init(in_channels),
        "conv1": conv_init(ks[0], (3, 1, 1, in_channels, out_channels)),
        "norm2": norm_init(out_channels),
        "conv2": conv_init(ks[1], (3, 1, 1, out_channels, out_channels)),
    }
    if temb_channels:
        p["time_emb_proj"] = linear_init(ks[2], temb_channels, out_channels)
    if in_channels != out_channels:
        p["conv_shortcut"] = conv_init(ks[3], (1, 1, 1, in_channels, out_channels))
    return p


def temporal_resnet_block(
    params: dict,
    x: jax.Array,
    temb: Optional[jax.Array] = None,
    eps: float = 1e-6,
    compute_dtype=None,
) -> jax.Array:
    """(B, F, H, W, C) -> same. temb: (B, F, temb_dim), added per frame
    (diffusers TemporalResnetBlock.forward)."""
    h = group_norm_silu(params["norm1"], x, eps=eps)
    h = conv3d_temporal(params["conv1"], h, compute_dtype=compute_dtype)
    t = None
    if temb is not None and "time_emb_proj" in params:
        # (B, F, C) per-frame broadcast folded into norm2 (see
        # resnet_block_2d; norm stats here span the whole video — torch
        # GroupNorm on (B, C, F, H, W) — and the fold preserves that).
        t = linear(params["time_emb_proj"], silu(temb), compute_dtype)
    h = group_norm_silu(params["norm2"], h, eps=eps, add=t)
    h = conv3d_temporal(params["conv2"], h, compute_dtype=compute_dtype)
    if "conv_shortcut" in params:
        x = conv3d_temporal(params["conv_shortcut"], x, compute_dtype=compute_dtype)
    return x + h


# ---------------------------------------------------------------------------
# AlphaBlender
# ---------------------------------------------------------------------------

def init_alpha_blender(alpha: float) -> dict:
    return {"mix_factor": jnp.asarray([alpha], jnp.float32)}


def alpha_blend(
    params: dict,
    x_spatial: jax.Array,
    x_temporal: jax.Array,
    image_only_indicator: Optional[jax.Array],
    merge_strategy: str = "learned_with_images",
    switch_spatial_to_temporal_mix: bool = False,
) -> jax.Array:
    """diffusers AlphaBlender. alpha weights the SPATIAL branch; the VAE
    temporal decoder flips the roles (switch_spatial_to_temporal_mix=True).

    image_only_indicator: (B, F) zeros for video (alpha = sigmoid(mix_factor)),
    ones force pure-spatial for stills. Broadcasting assumes channels-last
    (B, F, ..., C) or fused (B*F, ..., C) inputs.
    """
    mix = params["mix_factor"].astype(jnp.float32)
    if merge_strategy == "learned" or image_only_indicator is None:
        alpha = jax.nn.sigmoid(mix)[0]
    elif merge_strategy == "learned_with_images":
        ind = image_only_indicator.astype(bool)
        alpha_bf = jnp.where(ind, 1.0, jax.nn.sigmoid(mix)[0])  # (B, F)
        if x_spatial.ndim == 5:  # (B, F, H, W, C)
            alpha = alpha_bf[:, :, None, None, None]
        elif x_spatial.ndim == 3:  # (B*F, S, C)
            alpha = alpha_bf.reshape(-1)[:, None, None]
        else:
            raise ValueError(f"unsupported ndim {x_spatial.ndim}")
    elif merge_strategy == "fixed":
        alpha = mix[0]
    else:
        raise ValueError(merge_strategy)

    alpha = jnp.asarray(alpha, x_spatial.dtype)
    if switch_spatial_to_temporal_mix:
        alpha = 1.0 - alpha
    return alpha * x_spatial + (1.0 - alpha) * x_temporal


# ---------------------------------------------------------------------------
# SpatioTemporalResBlock
# ---------------------------------------------------------------------------

def init_spatio_temporal_res_block(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    temb_channels: Optional[int],
    merge_factor: float = 0.5,
) -> dict:
    k1, k2 = rsplit(key)
    return {
        "spatial_res_block": init_resnet_block_2d(k1, in_channels, out_channels, temb_channels),
        "temporal_res_block": init_temporal_resnet_block(k2, out_channels, out_channels, temb_channels),
        "time_mixer": init_alpha_blender(merge_factor),
    }


def spatio_temporal_res_block(
    params: dict,
    x: jax.Array,
    temb: Optional[jax.Array],
    num_frames: int,
    image_only_indicator: Optional[jax.Array] = None,
    eps: float = 1e-5,
    temporal_eps: Optional[float] = None,
    merge_strategy: str = "learned_with_images",
    switch_spatial_to_temporal_mix: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """(B*F, H, W, C) -> (B*F, H, W, C_out).

    Spatial ResBlock on fused batch, then a temporal ResBlock over the frame
    axis, blended by AlphaBlender (diffusers SpatioTemporalResBlock.forward).
    temb: (B*F, temb_dim) or None.
    """
    h_spatial = resnet_block_2d(params["spatial_res_block"], x, temb, eps=eps, compute_dtype=compute_dtype)

    bf, hh, ww, c = h_spatial.shape
    b = bf // num_frames
    h5 = h_spatial.reshape(b, num_frames, hh, ww, c)
    temb5 = temb.reshape(b, num_frames, -1) if temb is not None else None
    h_temporal = temporal_resnet_block(
        params["temporal_res_block"], h5, temb5, eps=temporal_eps if temporal_eps is not None else eps,
        compute_dtype=compute_dtype,
    )
    out = alpha_blend(
        params["time_mixer"],
        h5,
        h_temporal,
        image_only_indicator,
        merge_strategy=merge_strategy,
        switch_spatial_to_temporal_mix=switch_spatial_to_temporal_mix,
    )
    return out.reshape(bf, hh, ww, c)
