"""AutoencoderKLTemporalDecoder: SD 2D encoder + SVD temporal-conv decoder.

Rebuild of diffusers==0.24.0 autoencoder_kl_temporal_decoder.py / vae.py, which
the reference loads frozen (train_svd_traj_blender_14.py:880-884) and drives
chunked at pipeline_stable_video_diffusion_controlnet.py:225-251.

Encoder path runs per frame (pure 2D); the decoder mixes frames via
SpatioTemporalResBlocks with merge_strategy="learned" and
switch_spatial_to_temporal_mix=True, plus a final (3,1,1) temporal conv.
All norms eps=1e-6 except the decoder's temporal resnets (temporal_eps=1e-5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from posetraj_tpu.configs import VAEConfig
from posetraj_tpu.core.init import conv_init, linear_init, norm_init, rsplit
from posetraj_tpu.models.resnet import (
    init_resnet_block_2d,
    init_spatio_temporal_res_block,
    resnet_block_2d,
    spatio_temporal_res_block,
)
from posetraj_tpu.ops.attention import attention
from posetraj_tpu.ops.primitives import (
    conv2d,
    conv3d_temporal,
    downsample_2x,
    group_norm,
    group_norm_silu,
    linear,
    silu,
    upsample_nearest_2x,
)


# ---------------------------------------------------------------------------
# VAE single-head spatial attention (mid blocks)
# ---------------------------------------------------------------------------


def init_vae_attention(key: jax.Array, channels: int) -> dict:
    ks = rsplit(key, 4)
    return {
        "group_norm": norm_init(channels),
        "to_q": linear_init(ks[0], channels, channels, use_bias=True),
        "to_k": linear_init(ks[1], channels, channels, use_bias=True),
        "to_v": linear_init(ks[2], channels, channels, use_bias=True),
        "to_out": linear_init(ks[3], channels, channels, use_bias=True),
    }


def vae_attention(params: dict, x: jax.Array, eps: float = 1e-6, compute_dtype=None) -> jax.Array:
    """Single-head self-attention with residual over (N, H, W, C) (diffusers
    Attention with residual_connection=True, heads=1, upcast)."""
    n, h, w, c = x.shape
    residual = x
    hflat = group_norm(params["group_norm"], x, eps=eps).reshape(n, h * w, c)
    q = linear(params["to_q"], hflat, compute_dtype)
    k = linear(params["to_k"], hflat, compute_dtype)
    v = linear(params["to_v"], hflat, compute_dtype)
    out = attention(q, k, v, num_heads=1, backend="xla")
    out = linear(params["to_out"], out, compute_dtype)
    return out.reshape(n, h, w, c) + residual


# ---------------------------------------------------------------------------
# Encoder (2D, per-frame)
# ---------------------------------------------------------------------------


def init_encoder(key: jax.Array, cfg: VAEConfig) -> dict:
    boc = cfg.block_out_channels
    n = len(boc)
    ks = rsplit(key, n + 6)
    p: dict = {
        "conv_in": conv_init(ks[0], (3, 3, cfg.in_channels, boc[0])),
        "down_blocks": [],
    }
    out_ch = boc[0]
    for i in range(n):
        in_ch, out_ch = out_ch, boc[i]
        bks = rsplit(ks[1 + i], cfg.layers_per_block + 1)
        block = {
            "resnets": [
                init_resnet_block_2d(bks[j], in_ch if j == 0 else out_ch, out_ch, None)
                for j in range(cfg.layers_per_block)
            ]
        }
        if i != n - 1:
            block["downsampler"] = conv_init(bks[-1], (3, 3, out_ch, out_ch))
        p["down_blocks"].append(block)

    mks = rsplit(ks[n + 1], 3)
    p["mid_block"] = {
        "resnets": [
            init_resnet_block_2d(mks[0], boc[-1], boc[-1], None),
            init_resnet_block_2d(mks[1], boc[-1], boc[-1], None),
        ],
        "attention": init_vae_attention(mks[2], boc[-1]),
    }
    p["conv_norm_out"] = norm_init(boc[-1])
    p["conv_out"] = conv_init(ks[n + 2], (3, 3, boc[-1], 2 * cfg.latent_channels))
    # AutoencoderKLTemporalDecoder has quant_conv but NO post_quant_conv.
    p["quant_conv"] = conv_init(ks[n + 3], (1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels))
    return p


def encode(
    params: dict,
    cfg: VAEConfig,
    x: jax.Array,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """(N, H, W, 3) in [-1, 1] -> (mean, logvar), each (N, H/8, W/8, 4).

    The pipeline upcasts VAE encode to fp32 (pipeline...controlnet.py:453-462);
    default compute dtype here is fp32 to match.
    """
    h = x.astype(compute_dtype)
    h = conv2d(params["conv_in"], h, compute_dtype=compute_dtype)
    for block in params["down_blocks"]:
        for res_p in block["resnets"]:
            h = resnet_block_2d(res_p, h, None, eps=cfg.eps, compute_dtype=compute_dtype)
        if "downsampler" in block:
            h = downsample_2x(block["downsampler"], h, asymmetric_pad=True, compute_dtype=compute_dtype)
    mb = params["mid_block"]
    h = resnet_block_2d(mb["resnets"][0], h, None, eps=cfg.eps, compute_dtype=compute_dtype)
    h = vae_attention(mb["attention"], h, eps=cfg.eps, compute_dtype=compute_dtype)
    h = resnet_block_2d(mb["resnets"][1], h, None, eps=cfg.eps, compute_dtype=compute_dtype)
    h = group_norm_silu(params["conv_norm_out"], h, eps=cfg.eps)
    h = conv2d(params["conv_out"], h, compute_dtype=compute_dtype)
    moments = conv2d(params["quant_conv"], h, compute_dtype=compute_dtype)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean, logvar


def sample_latent(mean: jax.Array, logvar: jax.Array, key: Optional[jax.Array]) -> jax.Array:
    """DiagonalGaussianDistribution.sample() / .mode() (key=None)."""
    if key is None:
        return mean
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


# ---------------------------------------------------------------------------
# Temporal decoder
# ---------------------------------------------------------------------------


def init_temporal_decoder(key: jax.Array, cfg: VAEConfig) -> dict:
    boc = cfg.block_out_channels
    n = len(boc)
    ks = rsplit(key, n + 6)
    p: dict = {
        "conv_in": conv_init(ks[0], (3, 3, cfg.latent_channels, boc[-1])),
    }
    # MidBlockTemporalDecoder(num_layers=layers_per_block): resnet_0 -> attn
    # -> resnet_1.. (2 resnets at the flagship layers_per_block=2).
    mks = rsplit(ks[1], cfg.layers_per_block + 1)
    p["mid_block"] = {
        "resnets": [
            init_spatio_temporal_res_block(mks[j], boc[-1], boc[-1], None, merge_factor=0.0)
            for j in range(cfg.layers_per_block)
        ],
        "attention": init_vae_attention(mks[-1], boc[-1]),
    }
    p["up_blocks"] = []
    rev = list(reversed(boc))
    out_ch = rev[0]
    for i in range(n):
        in_ch, out_ch = out_ch, rev[i]
        bks = rsplit(ks[2 + i], cfg.layers_per_block + 2)
        block = {
            "resnets": [
                init_spatio_temporal_res_block(
                    bks[j], in_ch if j == 0 else out_ch, out_ch, None, merge_factor=0.0
                )
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if i != n - 1:
            block["upsampler"] = conv_init(bks[-1], (3, 3, out_ch, out_ch))
        p["up_blocks"].append(block)

    p["conv_norm_out"] = norm_init(boc[0])
    p["conv_out"] = conv_init(ks[n + 2], (3, 3, boc[0], cfg.out_channels))
    p["time_conv_out"] = conv_init(ks[n + 3], (3, 1, 1, cfg.out_channels, cfg.out_channels))
    return p


def _decoder_res_block(params, x, num_frames, indicator, cfg, compute_dtype):
    return spatio_temporal_res_block(
        params, x, None, num_frames, indicator,
        eps=cfg.eps, temporal_eps=1e-5,
        merge_strategy="learned", switch_spatial_to_temporal_mix=True,
        compute_dtype=compute_dtype,
    )


def decode(
    params: dict,
    cfg: VAEConfig,
    z: jax.Array,
    num_frames: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """(B*F, h, w, 4) latents (already divided by scaling_factor by the caller,
    matching decode_latents at pipeline...controlnet.py:229) -> (B*F, H, W, 3)."""
    bf = z.shape[0]
    b = bf // num_frames
    indicator = jnp.zeros((b, num_frames), jnp.float32)

    h = conv2d(params["conv_in"], z.astype(compute_dtype), compute_dtype=compute_dtype)
    mb = params["mid_block"]
    h = _decoder_res_block(mb["resnets"][0], h, num_frames, indicator, cfg, compute_dtype)
    # MidBlockTemporalDecoder.forward: `for resnet, attn in zip(resnets[1:],
    # attentions)` — with a single attention the zip yields at most ONE
    # (attn -> resnet) pair, and yields none at layers_per_block=1 (the
    # attention exists as a parameter but is never applied). Mirror exactly.
    for res_p in mb["resnets"][1:2]:
        h = vae_attention(mb["attention"], h, eps=cfg.eps, compute_dtype=compute_dtype)
        h = _decoder_res_block(res_p, h, num_frames, indicator, cfg, compute_dtype)

    for block in params["up_blocks"]:
        for res_p in block["resnets"]:
            h = _decoder_res_block(res_p, h, num_frames, indicator, cfg, compute_dtype)
        if "upsampler" in block:
            h = upsample_nearest_2x(block["upsampler"], h, compute_dtype=compute_dtype)

    h = group_norm_silu(params["conv_norm_out"], h, eps=cfg.eps)
    h = conv2d(params["conv_out"], h, compute_dtype=compute_dtype)

    # Final temporal conv over frames (autoencoder_kl_temporal_decoder.py
    # time_conv_out).
    hh, ww, cc = h.shape[1:]
    h5 = h.reshape(b, num_frames, hh, ww, cc)
    h5 = conv3d_temporal(params["time_conv_out"], h5, compute_dtype=compute_dtype)
    return h5.reshape(bf, hh, ww, cc)


def init_vae(key: jax.Array, cfg: VAEConfig) -> dict:
    k1, k2 = rsplit(key)
    return {"encoder": init_encoder(k1, cfg), "decoder": init_temporal_decoder(k2, cfg)}
