"""Sinusoidal-embedding parity vs an independent torch re-derivation of
diffusers' get_timestep_embedding (flip_sin_to_cos=True, shift=0 — the SVD
Timesteps config, unet...controlnet.py:137-143), plus CLIP preprocessing
constants vs transformers' CLIPImageProcessor."""

import math

import numpy as np
import torch
import jax.numpy as jnp

from posetraj_tpu.configs import CLIPVisionConfig
from posetraj_tpu.models.clip import clip_preprocess
from posetraj_tpu.models.embeddings import sinusoidal_timestep_embedding


def _torch_get_timestep_embedding(timesteps, dim, flip_sin_to_cos=True, shift=0.0):
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


def test_timestep_embedding_matches_torch():
    t = np.asarray([0.0, 1.0, 2.75, 999.0, -1.62], np.float32)  # incl. v-pred log-sigmas
    ours = np.asarray(sinusoidal_timestep_embedding(jnp.asarray(t), 320))
    theirs = _torch_get_timestep_embedding(torch.from_numpy(t), 320).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)  # fp32 sin/cos of large args differ in ulps between XLA and torch


def test_added_time_embedding_dim_256():
    t = np.asarray([6.0, 128.0, 0.02], np.float32)
    ours = np.asarray(sinusoidal_timestep_embedding(jnp.asarray(t), 256))
    theirs = _torch_get_timestep_embedding(torch.from_numpy(t), 256).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)  # fp32 sin/cos of large args differ in ulps between XLA and torch


def test_clip_preprocess_matches_transformers_constants():
    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor()
    cfg = CLIPVisionConfig()
    np.testing.assert_allclose(cfg.image_mean, proc.image_mean, rtol=1e-7)
    np.testing.assert_allclose(cfg.image_std, proc.image_std, rtol=1e-7)
    x = np.random.RandomState(0).rand(1, 4, 4, 3).astype(np.float32)
    ours = np.asarray(clip_preprocess(jnp.asarray(x), cfg))
    theirs = (x - np.asarray(proc.image_mean, np.float32)) / np.asarray(proc.image_std, np.float32)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
