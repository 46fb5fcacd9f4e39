"""Golden tests for the Euler-Discrete-Karras schedule and step math.

The reference scheduler (utils/scheduling_euler_discrete_karras_fix.py) can't
be imported here (needs diffusers), so each test re-derives the reference
equations independently in numpy/torch, line-for-line from the cited reference
code, and checks our JAX implementation against them.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from posetraj_tpu.configs import SchedulerConfig
from posetraj_tpu.diffusion import (
    make_schedule,
    euler_step,
    scale_model_input,
    add_noise,
    sigma_to_timestep,
)

SVD_CFG = SchedulerConfig()  # checkpoint defaults: scaled_linear + karras + v_prediction + leading


def _reference_schedule(num_steps, num_train_timesteps=1000, beta_start=0.0001, beta_end=0.02,
                        sigma_min=0.002, sigma_max=700.0):
    # scheduling_euler_discrete_karras_fix.py:200-202, 212-220 (scaled_linear)
    betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    sigmas_full = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
    # :303-306 linspace spacing
    timesteps = np.linspace(0, num_train_timesteps - 1, num_steps, dtype=np.float64)[::-1].copy()
    # :327-328 linear interpolation
    sigmas = np.interp(timesteps, np.arange(0, len(sigmas_full)), sigmas_full)
    # :375-399 karras fix honoring config sigma_min/max, rho=7
    rho = 7.0
    ramp = np.linspace(0, 1, num_steps)
    sigmas = (sigma_max ** (1 / rho) + ramp * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    # :344-347 continuous v-pred timesteps
    cond_t = 0.25 * np.log(sigmas)
    return np.concatenate([sigmas, [0.0]]), cond_t


@pytest.mark.parametrize("n", [4, 25])
def test_karras_sigma_ladder_matches_reference(n):
    sched = make_schedule(SVD_CFG, n)
    ref_sigmas, ref_t = _reference_schedule(n)
    np.testing.assert_allclose(sched.sigmas, ref_sigmas, rtol=1e-6)
    np.testing.assert_allclose(sched.timesteps, ref_t, rtol=1e-6)
    assert sched.sigmas[0] == pytest.approx(700.0)
    assert sched.sigmas[-2] == pytest.approx(0.002)
    assert sched.sigmas[-1] == 0.0
    # SVD ships "leading" spacing -> init noise std is sqrt(max^2+1) (:248-255)
    assert sched.init_noise_sigma == pytest.approx((700.0**2 + 1) ** 0.5, rel=1e-9)
    # linspace/trailing spacing -> plain sigma_max
    lin = make_schedule(SchedulerConfig(timestep_spacing="linspace"), n)
    assert lin.init_noise_sigma == pytest.approx(700.0)
    # on the karras+continuous path spacing cannot change sigmas/timesteps
    np.testing.assert_allclose(lin.sigmas, sched.sigmas, rtol=0)
    np.testing.assert_allclose(lin.timesteps, sched.timesteps, rtol=0)


def test_leading_spacing_timesteps_match_reference():
    # scheduling...karras_fix.py:308-313: integer step-ratio grid + steps_offset
    cfg = SchedulerConfig(
        use_karras_sigmas=False, timestep_type="discrete", prediction_type="epsilon"
    )
    sched = make_schedule(cfg, 25)
    step_ratio = 1000 // 25
    expect_t = (np.arange(0, 25) * step_ratio).round()[::-1] + 1
    np.testing.assert_allclose(sched.timesteps, expect_t, rtol=0)


def test_non_karras_interpolated_sigmas():
    cfg = SchedulerConfig(
        use_karras_sigmas=False, timestep_type="discrete", prediction_type="epsilon",
        beta_start=0.0001, beta_end=0.02, timestep_spacing="linspace",
    )
    sched = make_schedule(cfg, 10)
    betas = np.linspace(0.0001**0.5, 0.02**0.5, 1000) ** 2
    ac = np.cumprod(1 - betas)
    sigmas_full = ((1 - ac) / ac) ** 0.5
    timesteps = np.linspace(0, 999, 10, dtype=np.float64)[::-1]
    expect = np.interp(timesteps, np.arange(1000), sigmas_full)
    np.testing.assert_allclose(sched.sigmas[:-1], expect, rtol=1e-6)
    np.testing.assert_allclose(sched.timesteps, timesteps, rtol=1e-6)


def test_scale_model_input():
    x = jnp.ones((2, 3)) * 4.0
    sigma = 2.0
    out = scale_model_input(x, sigma)
    np.testing.assert_allclose(np.asarray(out), 4.0 / np.sqrt(5.0), rtol=1e-6)


def test_sigma_to_timestep():
    np.testing.assert_allclose(
        np.asarray(sigma_to_timestep(jnp.asarray([1.0, np.e**4]))), [0.0, 1.0], atol=1e-4
    )


@pytest.mark.parametrize("pred_type", ["epsilon", "v_prediction", "sample"])
def test_euler_step_matches_reference_equations(pred_type):
    rng = np.random.RandomState(0)
    sample = rng.randn(2, 4, 8, 8).astype(np.float32)
    model_output = rng.randn(2, 4, 8, 8).astype(np.float32)
    sigma, sigma_next = 5.0, 3.0

    # scheduling_euler_discrete_karras_fix.py:500-517, gamma=0 so sigma_hat=sigma
    if pred_type == "epsilon":
        pred_orig = sample - sigma * model_output
    elif pred_type == "v_prediction":
        pred_orig = model_output * (-sigma / (sigma**2 + 1) ** 0.5) + sample / (sigma**2 + 1)
    else:
        pred_orig = model_output
    derivative = (sample - pred_orig) / sigma
    expect = sample + derivative * (sigma_next - sigma)

    prev, got_orig = euler_step(jnp.asarray(model_output), jnp.asarray(sample), sigma, sigma_next, pred_type)
    np.testing.assert_allclose(np.asarray(prev), expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_orig), pred_orig, rtol=1e-5, atol=1e-5)


def test_euler_step_final_step_returns_pred_x0_scaled():
    # Last step: sigma_next=0 -> prev = pred_original (Euler exact for sigma->0)
    sample = jnp.ones((1, 2)) * 3.0
    model_output = jnp.zeros((1, 2))
    prev, pred = euler_step(model_output, sample, 1.0, 0.0, "epsilon")
    np.testing.assert_allclose(np.asarray(prev), np.asarray(pred), rtol=1e-6)


def test_add_noise_broadcast():
    x = jnp.zeros((2, 3, 4))
    n = jnp.ones((2, 3, 4))
    sig = jnp.asarray([1.0, 2.0])
    out = add_noise(x, n, sig)
    assert out.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(out[0]), 1.0)
    np.testing.assert_allclose(np.asarray(out[1]), 2.0)


def test_full_denoise_trajectory_converges():
    """Driving the ODE with a perfect v-prediction oracle recovers x0."""
    sched = make_schedule(SVD_CFG, 25)
    rng = np.random.RandomState(1)
    x0 = rng.randn(1, 4, 4).astype(np.float32)
    noise = rng.randn(1, 4, 4).astype(np.float32)
    x = jnp.asarray(x0 + noise * sched.sigmas[0])
    for i in range(sched.num_steps):
        sigma = sched.sigmas[i]
        # Oracle model: F such that F*c_out + x_in*c_skip == x0, where the
        # model sees the c_in-scaled input (pipeline scale_model_input).
        c_out = -sigma / np.sqrt(sigma**2 + 1)
        c_skip = 1 / (sigma**2 + 1)
        model_out = (jnp.asarray(x0) - c_skip * x) / c_out
        x, _ = euler_step(model_out, x, sigma, sched.sigmas[i + 1], "v_prediction")
    np.testing.assert_allclose(np.asarray(x), x0, atol=1e-3)
