"""Antialiased resize: 2-pass Gaussian blur + bicubic interpolation.

Parity rebuild of the reference's `_resize_with_antialiasing`
(pipeline_stable_video_diffusion_controlnet.py:604-712): skimage-style sigma
from the scale factor, odd kernel of ~2*2*sigma taps, reflect padding,
separable blur, then bicubic resize with align_corners=True.

Channels-last (N, H, W, C). Kernel sizes and blur weights depend only on
static shapes, so everything is jit-friendly with no dynamic shapes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """Matches pipeline...controlnet.py:683-696 (center at ksize//2)."""
    x = np.arange(ksize, dtype=np.float64) - ksize // 2
    if ksize % 2 == 0:
        x = x + 0.5
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _reflect_pad_1d(x: jax.Array, axis: int, pad: Tuple[int, int]) -> jax.Array:
    pads = [(0, 0)] * x.ndim
    pads[axis] = pad
    return jnp.pad(x, pads, mode="reflect")


def gaussian_blur2d(x: jax.Array, ksize: Tuple[int, int], sigma: Tuple[float, float]) -> jax.Array:
    """Separable blur over (N, H, W, C) with reflect padding
    (pipeline...controlnet.py:699-712: x-pass then y-pass)."""
    ky, kx = ksize
    kernel_x = jnp.asarray(_gaussian_kernel1d(kx, sigma[1]), x.dtype)
    kernel_y = jnp.asarray(_gaussian_kernel1d(ky, sigma[0]), x.dtype)

    # x (width) pass
    pad_front = (kx - 1) // 2
    h = _reflect_pad_1d(x, 2, (pad_front, (kx - 1) - pad_front))
    h = jax.lax.conv_general_dilated(
        h,
        kernel_x.reshape(1, kx, 1, 1) * jnp.eye(x.shape[-1], dtype=x.dtype)[None, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # y (height) pass
    pad_front = (ky - 1) // 2
    h = _reflect_pad_1d(h, 1, (pad_front, (ky - 1) - pad_front))
    h = jax.lax.conv_general_dilated(
        h,
        kernel_y.reshape(ky, 1, 1, 1) * jnp.eye(x.shape[-1], dtype=x.dtype)[None, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return h


def _cubic_weight(t: jax.Array, a: float = -0.75) -> jax.Array:
    """torch bicubic convolution kernel (a=-0.75)."""
    at = jnp.abs(t)
    w1 = (a + 2) * at**3 - (a + 3) * at**2 + 1
    w2 = a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _bicubic_1d(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    """Bicubic resample along one axis with align_corners=True (matching
    torch.nn.functional.interpolate at pipeline...controlnet.py:633)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
    else:
        scale = 0.0
    coords = jnp.arange(out_size, dtype=jnp.float32) * scale
    idx0 = jnp.floor(coords).astype(jnp.int32)
    t = coords - idx0

    gathered = []
    weights = []
    for offset in (-1, 0, 1, 2):
        idx = jnp.clip(idx0 + offset, 0, in_size - 1)
        gathered.append(jnp.take(x, idx, axis=axis))
        weights.append(_cubic_weight(t - offset))
    wshape = [1] * x.ndim
    wshape[axis] = out_size
    out = sum(g * w.reshape(wshape).astype(x.dtype) for g, w in zip(gathered, weights))
    return out


@partial(jax.jit, static_argnums=(1,))
def resize_antialias(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """(N, H, W, C) -> (N, size[0], size[1], C), reference-parity antialiasing."""
    h, w = x.shape[1], x.shape[2]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3))
    ks = (ks[0] + 1 if ks[0] % 2 == 0 else ks[0], ks[1] + 1 if ks[1] % 2 == 0 else ks[1])
    x = gaussian_blur2d(x, ks, sigmas)
    x = _bicubic_1d(x, 1, size[0])
    x = _bicubic_1d(x, 2, size[1])
    return x
