"""EDM preconditioning scalings, loss weighting, and the cosine-interpolated
training-sigma sampler.

Reference math: train_svd_traj_blender_14.py:223-269 (sampler, from
k-diffusion / simple-diffusion) and :1323-1336 (c_out/c_skip/weighting).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from posetraj_tpu.configs import EDMConfig


def edm_scalings(sigma: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(c_in, c_out, c_skip) for the SVD/EDM parameterization.

    c_in  = 1/sqrt(sigma^2+1)   (input scaling, train...blender_14.py:1247)
    c_out = -sigma/sqrt(sigma^2+1)             (:1325)
    c_skip = 1/(sigma^2+1)                     (:1326)
    """
    sigma = jnp.asarray(sigma, jnp.float32)
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    c_skip = 1.0 / (sigma**2 + 1.0)
    return c_in, c_out, c_skip


def edm_loss_weight(sigma: jax.Array) -> jax.Array:
    """w(sigma) = (1 + sigma^2) / sigma^2 (train...blender_14.py:1328)."""
    sigma = jnp.asarray(sigma, jnp.float32)
    return (1.0 + sigma**2) / sigma**2


def stratified_uniform(key: jax.Array, shape, group: int = 0, groups: int = 1, dtype=jnp.float32) -> jax.Array:
    """Stratified U[0,1) samples (train...blender_14.py:223-232)."""
    if groups <= 0 or not (0 <= group < groups):
        raise ValueError("invalid group/groups")
    n = shape[-1] * groups
    offsets = jnp.arange(group, n, groups, dtype=dtype)
    u = jax.random.uniform(key, shape, dtype)
    return (offsets + u) / n


def rand_cosine_interpolated(
    key: jax.Array,
    shape,
    cfg: EDMConfig = EDMConfig(),
    dtype=jnp.float32,
) -> jax.Array:
    """Sample training sigmas from the interpolated cosine logSNR schedule
    (simple diffusion), matching train_svd_traj_blender_14.py:235-261 with the
    reference's constants (image_d=64, noise_d 32/64, sigma_data=0.5,
    sigma in [0.002, 700])."""

    def logsnr_schedule_cosine(t, logsnr_min, logsnr_max):
        t_min = math.atan(math.exp(-0.5 * logsnr_max))
        t_max = math.atan(math.exp(-0.5 * logsnr_min))
        return -2.0 * jnp.log(jnp.tan(t_min + t * (t_max - t_min)))

    def shifted(t, noise_d, logsnr_min, logsnr_max):
        shift = 2.0 * math.log(noise_d / cfg.image_d)
        return logsnr_schedule_cosine(t, logsnr_min - shift, logsnr_max - shift) + shift

    logsnr_min = -2.0 * math.log(cfg.min_value / cfg.sigma_data)
    logsnr_max = -2.0 * math.log(cfg.max_value / cfg.sigma_data)
    u = stratified_uniform(key, shape, dtype=dtype)
    low = shifted(u, cfg.noise_d_low, logsnr_min, logsnr_max)
    high = shifted(u, cfg.noise_d_high, logsnr_min, logsnr_max)
    logsnr = low + u * (high - low)  # torch.lerp(low, high, t)
    return jnp.exp(-logsnr / 2.0) * cfg.sigma_data
