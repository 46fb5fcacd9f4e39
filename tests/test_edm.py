"""EDM scalings / loss-weight / sigma-sampler tests, cross-checked against an
independent torch re-derivation of train_svd_traj_blender_14.py:223-269."""

import math

import numpy as np
import torch
import jax
import jax.numpy as jnp

from posetraj_tpu.configs import EDMConfig
from posetraj_tpu.diffusion import edm_scalings, edm_loss_weight, rand_cosine_interpolated


def test_edm_scalings_identities():
    sigma = jnp.asarray([0.002, 0.5, 1.0, 700.0])
    c_in, c_out, c_skip = edm_scalings(sigma)
    s = np.asarray(sigma, np.float64)
    np.testing.assert_allclose(np.asarray(c_in), 1 / np.sqrt(s**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), -s / np.sqrt(s**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_skip), 1 / (s**2 + 1), rtol=1e-6)
    # boundary-condition identity: c_skip + sigma * (-c_out/sqrt(s^2+1))... the
    # key training identity is c_skip * (s^2+1) == 1 and c_out^2 * (s^2+1) == s^2
    np.testing.assert_allclose(np.asarray(c_skip) * (s**2 + 1), 1.0, rtol=1e-6)


def test_edm_loss_weight():
    sigma = jnp.asarray([0.5, 2.0])
    w = edm_loss_weight(sigma)
    np.testing.assert_allclose(np.asarray(w), [(1 + 0.25) / 0.25, (1 + 4.0) / 4.0], rtol=1e-6)


def _torch_rand_cosine_interpolated(u, image_d, noise_d_low, noise_d_high, sigma_data, min_value, max_value):
    """train_svd_traj_blender_14.py:235-261 with the uniform draw substituted."""

    def logsnr_schedule_cosine(t, logsnr_min, logsnr_max):
        t_min = math.atan(math.exp(-0.5 * logsnr_max))
        t_max = math.atan(math.exp(-0.5 * logsnr_min))
        return -2 * torch.log(torch.tan(t_min + t * (t_max - t_min)))

    def shifted(t, noise_d, logsnr_min, logsnr_max):
        shift = 2 * math.log(noise_d / image_d)
        return logsnr_schedule_cosine(t, logsnr_min - shift, logsnr_max - shift) + shift

    logsnr_min = -2 * math.log(min_value / sigma_data)
    logsnr_max = -2 * math.log(max_value / sigma_data)
    low = shifted(u, noise_d_low, logsnr_min, logsnr_max)
    high = shifted(u, noise_d_high, logsnr_min, logsnr_max)
    logsnr = torch.lerp(low, high, u)
    return torch.exp(-logsnr / 2) * sigma_data


def test_cosine_interpolated_matches_torch_reference_math():
    cfg = EDMConfig()
    key = jax.random.PRNGKey(0)
    sigmas = rand_cosine_interpolated(key, (4096,), cfg)
    # Reconstruct: with groups=1 the stratified draw is (arange(n)+u)/n. We
    # can't recover u directly, so instead run both impls on the same u by
    # reproducing the JAX-side stratified uniform here.
    n = 4096
    u_raw = jax.random.uniform(key, (n,))
    u = (jnp.arange(n) + u_raw) / n
    expect = _torch_rand_cosine_interpolated(
        torch.from_numpy(np.asarray(u, np.float64)),
        cfg.image_d, cfg.noise_d_low, cfg.noise_d_high,
        cfg.sigma_data, cfg.min_value, cfg.max_value,
    ).numpy()
    np.testing.assert_allclose(np.asarray(sigmas, np.float64), expect, rtol=2e-4)


def test_sigma_sampler_range():
    cfg = EDMConfig()
    sigmas = np.asarray(rand_cosine_interpolated(jax.random.PRNGKey(3), (10000,), cfg))
    assert sigmas.min() >= cfg.min_value * 0.99
    assert sigmas.max() <= cfg.max_value * 1.01
    assert np.isfinite(sigmas).all()
