"""Timestep / added-condition embeddings.

Math mirrors diffusers==0.24.0 embeddings.py (get_timestep_embedding with
flip_sin_to_cos=True, downscale_freq_shift=0 — the SVD configuration used at
unet_spatio_temporal_condition_controlnet.py:137-143) re-expressed as pure
functions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from posetraj_tpu.core.init import linear_init, rsplit
from posetraj_tpu.ops.primitives import linear, silu


def sinusoidal_timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """(B,) -> (B, dim) sinusoidal embedding, always fp32 (the torch `Timesteps`
    module always emits fp32; callers cast — unet...controlnet.py:406-409)."""
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def init_timestep_embedding(key: jax.Array, in_dim: int, time_embed_dim: int, out_dim: int | None = None) -> dict:
    """diffusers TimestepEmbedding: linear -> silu -> linear."""
    k1, k2 = rsplit(key)
    return {
        "linear_1": linear_init(k1, in_dim, time_embed_dim),
        "linear_2": linear_init(k2, time_embed_dim, out_dim or time_embed_dim),
    }


def timestep_embedding(params: dict, sample: jax.Array, compute_dtype=None) -> jax.Array:
    h = linear(params["linear_1"], sample, compute_dtype)
    h = silu(h)
    return linear(params["linear_2"], h, compute_dtype)
