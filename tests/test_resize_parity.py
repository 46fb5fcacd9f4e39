"""Antialiased-resize parity vs an independent torch re-derivation of the
reference's `_resize_with_antialiasing`
(pipeline_stable_video_diffusion_controlnet.py:604-712): skimage sigma from
the scale factor, odd ~2*2*sigma kernel, reflect pad, separable blur, bicubic
align_corners=True."""

import numpy as np
import torch
import torch.nn.functional as tF
import jax.numpy as jnp

from posetraj_tpu.ops.resize import gaussian_blur2d, resize_antialias


def _torch_gaussian(window_size, sigma):
    x = (torch.arange(window_size, dtype=torch.float64) - window_size // 2)
    if window_size % 2 == 0:
        x = x + 0.5
    g = torch.exp(-x.pow(2.0) / (2 * sigma**2))
    return g / g.sum()


def _torch_blur(x_nchw, ks, sigmas):
    ky, kx = ks
    kern_x = _torch_gaussian(kx, sigmas[1]).view(1, 1, 1, kx)
    kern_y = _torch_gaussian(ky, sigmas[0]).view(1, 1, ky, 1)
    c = x_nchw.shape[1]
    pad_x = [(kx - 1) // 2, (kx - 1) - (kx - 1) // 2, 0, 0]
    pad_y = [0, 0, (ky - 1) // 2, (ky - 1) - (ky - 1) // 2]
    h = tF.pad(x_nchw, pad_x, mode="reflect")
    h = tF.conv2d(h, kern_x.expand(c, 1, 1, kx).double(), groups=c)
    h = tF.pad(h, pad_y, mode="reflect")
    h = tF.conv2d(h, kern_y.expand(c, 1, ky, 1).double(), groups=c)
    return h


def _torch_resize_antialias(x_nhwc, size):
    x = torch.from_numpy(np.asarray(x_nhwc, np.float64)).permute(0, 3, 1, 2)
    h, w = x.shape[-2:]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3))
    ks = (ks[0] + 1 if ks[0] % 2 == 0 else ks[0], ks[1] + 1 if ks[1] % 2 == 0 else ks[1])
    x = _torch_blur(x, ks, sigmas)
    out = tF.interpolate(x, size=size, mode="bicubic", align_corners=True)
    return out.permute(0, 2, 3, 1).numpy()


def test_gaussian_blur_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 40, 3).astype(np.float32)
    ks, sigmas = (5, 7), (1.2, 1.8)
    ours = np.asarray(gaussian_blur2d(jnp.asarray(x), ks, sigmas))
    theirs = _torch_blur(
        torch.from_numpy(x.astype(np.float64)).permute(0, 3, 1, 2), ks, sigmas
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_resize_antialias_matches_reference_math():
    """End-to-end: 64x80 -> 28x28 (a CLIP-style downscale)."""
    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 80, 3).astype(np.float32)
    ours = np.asarray(resize_antialias(jnp.asarray(x), (28, 28)))
    theirs = _torch_resize_antialias(x, (28, 28))
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_resize_upscale_path():
    """Upscale keeps the minimal 3-tap blur (sigma=0.001 ~ identity)."""
    rng = np.random.RandomState(2)
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    ours = np.asarray(resize_antialias(jnp.asarray(x), (32, 32)))
    theirs = _torch_resize_antialias(x, (32, 32))
    np.testing.assert_allclose(ours, theirs, atol=5e-5)
