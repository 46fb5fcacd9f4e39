"""Euler-Discrete scheduler with the Karras sigma "fix", as pure functions.

TPU-native redesign of the reference's stateful scheduler class
(utils/scheduling_euler_discrete_karras_fix.py:133-557): the sigma ladder is
precomputed host-side as a static numpy array; `euler_step` is a pure function
of (model_output, sample, sigma, sigma_next) suitable as a `lax.scan` body; the
stateful `_step_index` tensor search (:401-416) becomes the scan counter, so
the compiled denoise loop never syncs with the host.

All step math runs in float32 regardless of model compute dtype, mirroring the
reference's fp32 upcast (:481).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from posetraj_tpu.configs import SchedulerConfig


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Static denoising schedule: n steps -> n+1 sigmas (last is 0)."""

    sigmas: np.ndarray  # (n+1,) float32, descending, sigmas[-1] == 0
    timesteps: np.ndarray  # (n,) float32 model-conditioning timesteps
    init_noise_sigma: float
    prediction_type: str

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def _train_sigmas(cfg: SchedulerConfig) -> np.ndarray:
    """Full-resolution sigma table over num_train_timesteps (ascending in t).

    Mirrors scheduling_euler_discrete_karras_fix.py:196-220 for the beta
    schedules the reference can hit (SVD ships scaled_linear).
    """
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps, dtype=np.float64) ** 2
        )
    else:
        raise NotImplementedError(f"beta_schedule={cfg.beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod).astype(np.float64)


def _convert_to_karras(cfg: SchedulerConfig, in_sigmas: np.ndarray, num_steps: int) -> np.ndarray:
    """Karras et al. (2022) rho-7 ladder. The "karras fix": honor the config's
    sigma_min/sigma_max instead of the interpolated endpoints
    (scheduling_euler_discrete_karras_fix.py:375-399)."""
    sigma_min = cfg.sigma_min if cfg.sigma_min is not None else float(in_sigmas[-1])
    sigma_max = cfg.sigma_max if cfg.sigma_max is not None else float(in_sigmas[0])
    ramp = np.linspace(0, 1, num_steps)
    min_inv_rho = sigma_min ** (1 / cfg.rho)
    max_inv_rho = sigma_max ** (1 / cfg.rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** cfg.rho


def _sigma_to_t_interp(sigma: np.ndarray, log_sigmas: np.ndarray) -> np.ndarray:
    """Piecewise-linear inverse of the log-sigma table
    (scheduling_euler_discrete_karras_fix.py:352-373)."""
    log_sigma = np.log(np.maximum(sigma, 1e-10))
    dists = log_sigma - log_sigmas[:, None]
    low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(max=log_sigmas.shape[0] - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return ((1 - w) * low_idx + w * high_idx).reshape(sigma.shape)


def make_schedule(cfg: SchedulerConfig, num_inference_steps: int) -> Schedule:
    """Equivalent of set_timesteps (scheduling...karras_fix.py:290-350),
    host-side and stateless."""
    if cfg.timestep_spacing == "linspace":
        timesteps = np.linspace(0, cfg.num_train_timesteps - 1, num_inference_steps, dtype=np.float64)[::-1].copy()
    elif cfg.timestep_spacing == "leading":
        # :308-313 — the SVD checkpoint ships this spacing (tools/hub_configs.py)
        step_ratio = cfg.num_train_timesteps // num_inference_steps
        timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.float64)
        timesteps += cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = cfg.num_train_timesteps / num_inference_steps
        timesteps = np.arange(cfg.num_train_timesteps, 0, -step_ratio).round().astype(np.float64) - 1
    else:
        raise ValueError(f"timestep_spacing={cfg.timestep_spacing}")

    full_sigmas = _train_sigmas(cfg)
    log_sigmas = np.log(full_sigmas)
    if cfg.interpolation_type == "linear":
        sigmas = np.interp(timesteps, np.arange(0, len(full_sigmas)), full_sigmas)
    elif cfg.interpolation_type == "log_linear":
        sigmas = np.exp(np.linspace(np.log(full_sigmas[-1]), np.log(full_sigmas[0]), num_inference_steps + 1))
    else:
        raise ValueError(cfg.interpolation_type)

    if cfg.use_karras_sigmas:
        sigmas = _convert_to_karras(cfg, sigmas, num_inference_steps)
        timesteps = _sigma_to_t_interp(sigmas, log_sigmas)

    if cfg.timestep_type == "continuous" and cfg.prediction_type == "v_prediction":
        cond_timesteps = 0.25 * np.log(sigmas)
    else:
        cond_timesteps = timesteps

    sigmas_out = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    # init_noise_sigma (:248-255): max sigma for linspace/trailing spacing,
    # sqrt(max^2 + 1) otherwise — SVD's "leading" config hits the latter.
    max_sigma = float(sigmas_out.max())
    if cfg.timestep_spacing in ("linspace", "trailing"):
        init_noise_sigma = max_sigma
    else:
        init_noise_sigma = (max_sigma**2 + 1.0) ** 0.5
    return Schedule(
        sigmas=sigmas_out,
        timesteps=cond_timesteps.astype(np.float32),
        init_noise_sigma=init_noise_sigma,
        prediction_type=cfg.prediction_type,
    )


def training_sigmas_grid(cfg: SchedulerConfig) -> np.ndarray:
    """Full 1000-entry training sigma table (for add_noise-by-timestep paths)."""
    return _train_sigmas(cfg).astype(np.float32)


def sigma_to_timestep(sigma: jax.Array) -> jax.Array:
    """Continuous v-prediction conditioning timestep: 0.25 * log(sigma)
    (scheduling...karras_fix.py:236-239; train...blender_14.py:1244-1245)."""
    return 0.25 * jnp.log(sigma)


def scale_model_input(sample: jax.Array, sigma: jax.Array) -> jax.Array:
    """EDM c_in: x / sqrt(sigma^2 + 1) (scheduling...karras_fix.py:264-288)."""
    sigma = jnp.asarray(sigma, jnp.float32)
    return (sample.astype(jnp.float32) / jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)


def euler_step(
    model_output: jax.Array,
    sample: jax.Array,
    sigma: jax.Array,
    sigma_next: jax.Array,
    prediction_type: str = "v_prediction",
    gamma: float = 0.0,
    noise: Optional[jax.Array] = None,
    s_noise: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """One Euler ODE step in fp32; returns (prev_sample, pred_original_sample).

    Mirrors scheduling_euler_discrete_karras_fix.py:418-528 (gamma-churn branch
    included though the reference always runs gamma=0).
    """
    out_dtype = model_output.dtype
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    sigma_next = jnp.asarray(sigma_next, jnp.float32)

    sigma_hat = sigma * (gamma + 1.0)
    if gamma > 0:
        if noise is None:
            raise ValueError("gamma-churn requires noise")
        eps = noise.astype(jnp.float32) * s_noise
        sample = sample + eps * jnp.sqrt(sigma_hat**2 - sigma**2)

    if prediction_type in ("original_sample", "sample"):
        pred_original = model_output
    elif prediction_type == "epsilon":
        pred_original = sample - sigma_hat * model_output
    elif prediction_type == "v_prediction":
        # denoised = F * c_out + x * c_skip (:504-506)
        pred_original = model_output * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + sample / (sigma**2 + 1.0)
    else:
        raise ValueError(prediction_type)

    derivative = (sample - pred_original) / sigma_hat
    prev_sample = sample + derivative * (sigma_next - sigma_hat)
    return prev_sample.astype(out_dtype), pred_original


def add_noise(original: jax.Array, noise: jax.Array, sigma: jax.Array) -> jax.Array:
    """x_sigma = x + sigma * n (scheduling...karras_fix.py:530-553). `sigma`
    broadcasts from shape (batch,) over trailing dims."""
    sigma = jnp.asarray(sigma, original.dtype)
    sigma = sigma.reshape(sigma.shape + (1,) * (original.ndim - sigma.ndim))
    return original + noise * sigma
