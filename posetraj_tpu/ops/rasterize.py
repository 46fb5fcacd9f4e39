"""Trajectory -> control-video rasterization.

The reference draws per-frame trajectory maps with cv2 on the host, four
near-identical copies of the same recipe (dataset.py:741-766,
train_svd_traj_VIPSeg_14.py:202-217, run_inference_vipseg_json_repro.py:438-449):
for frame t, draw segment t->t+1 of every trajectory as a red 3px line plus a
green filled endpoint circle r=3, on black; the final (14th) control frame is
all black.

Two implementations:

  * `rasterize_cv2` — host-side cv2 parity mode, including quirk Q5: the
    reference converts BGR->RGB INSIDE the per-trajectory loop, so with k
    trajectories the line drawn for trajectory i has its R/B channels swapped
    (k - i) times: the last-drawn line ends up red, the one before blue, etc.
    Exposed via `fidelity_bgr_swap=True` (default) for dataset parity.

  * `rasterize_xla` — the TPU path: one vectorized segment-SDF pass, jittable
    and batchable, with `mode="hard"` (cv2-like crisp line/circle masks) or
    `mode="gaussian"` (soft Gaussian heatmap around the segment, the
    BASELINE.json "Gaussian-heatmap" conditioning rasterizer). Runs entirely
    on device; no host round-trip in the serving path.

Coordinates follow the reference's scaling convention (dataset.py:751):
x' = int(x * W_t / W_s), y' = int(y * H_t / H_s) done by the caller or via
`scale_trajectories`.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def scale_trajectories(traj: np.ndarray, src_hw: Tuple[int, int], dst_hw: Tuple[int, int]) -> np.ndarray:
    """(..., 2) [x, y] points from source-video pixels to target pixels with
    the reference's int() truncation (dataset.py:751)."""
    out = traj.astype(np.float64).copy()
    out[..., 0] = np.floor(out[..., 0] / src_hw[1] * dst_hw[1])
    out[..., 1] = np.floor(out[..., 1] / src_hw[0] * dst_hw[0])
    return out


# ---------------------------------------------------------------------------
# cv2 parity mode (host)
# ---------------------------------------------------------------------------


def rasterize_cv2(
    trajectories: np.ndarray,
    num_frames: int,
    size: Tuple[int, int],
    fidelity_bgr_swap: bool = True,
    line_width: int = 3,
    circle_radius: int = 3,
) -> np.ndarray:
    """trajectories: (K, >=num_frames, 2) int pixel coords. Returns
    (num_frames, H, W, 3) uint8: num_frames-1 drawn + 1 black pad frame."""
    import cv2

    h, w = size
    frames = []
    for t in range(num_frames - 1):
        img = np.zeros((h, w, 3), dtype=np.uint8)
        for k in range(trajectories.shape[0]):
            p0 = (int(trajectories[k, t, 0]), int(trajectories[k, t, 1]))
            p1 = (int(trajectories[k, t + 1, 0]), int(trajectories[k, t + 1, 1]))
            cv2.line(img, p0, p1, (0, 0, 255), line_width)
            cv2.circle(img, p1, circle_radius, (0, 255, 0), -1)
            if fidelity_bgr_swap:
                # Q5: conversion inside the per-trajectory loop (dataset.py:762)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if not fidelity_bgr_swap:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        frames.append(img)
    frames.append(np.zeros((h, w, 3), dtype=np.uint8))
    return np.stack(frames)


def rasterize_host(
    trajectories: np.ndarray,
    num_frames: int,
    size: Tuple[int, int],
    fidelity_bgr_swap: bool = True,
    impl: str = "cv2",
) -> np.ndarray:
    """Host-path rasterizer dispatch for the data loaders.

    impl:
      * "cv2"    — exact reference parity (pixel-identical to the four cv2
                   recipes in the reference, incl. quirk Q5). Default: the
                   loaders must reproduce the reference's training pixels.
      * "native" — dependency-free C++ kernel (posetraj_tpu/native): same
                   recipe and Q5 color algebra, distance-based thick-line
                   geometry (boundary pixels differ from cv2's Bresenham by
                   <1px). For TPU hosts where loader workers compete with the
                   runtime for cores.
      * "auto"   — "native" when the library is available, else "cv2".
    """
    if impl == "auto":
        from posetraj_tpu import native

        impl = "native" if native.is_available() else "cv2"
    if impl == "native":
        from posetraj_tpu import native

        return native.rasterize_trajectory_video_native(
            trajectories, num_frames, size, fidelity_bgr_swap=fidelity_bgr_swap
        )
    if impl != "cv2":
        raise ValueError(f"unknown rasterizer impl: {impl!r}")
    return rasterize_cv2(
        trajectories, num_frames, size, fidelity_bgr_swap=fidelity_bgr_swap
    )


# ---------------------------------------------------------------------------
# XLA mode (device)
# ---------------------------------------------------------------------------


def _segment_distance_sq(px, py, x0, y0, x1, y1):
    """Squared distance from pixel grid (H, W) to segment (per trajectory).
    All args broadcast: px/py (H, W, 1), endpoints (1, 1, K)."""
    dx, dy = x1 - x0, y1 - y0
    len_sq = dx * dx + dy * dy
    t = ((px - x0) * dx + (py - y0) * dy) / jnp.maximum(len_sq, 1e-8)
    t = jnp.clip(t, 0.0, 1.0)
    cx, cy = x0 + t * dx, y0 + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


@partial(jax.jit, static_argnames=("height", "width", "mode", "line_width", "circle_radius", "sigma"))
def rasterize_xla(
    points_from: jax.Array,
    points_to: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    mode: str = "hard",
    line_width: int = 3,
    circle_radius: int = 3,
    sigma: float = 3.0,
) -> jax.Array:
    """One control frame from K segments, fully on device.

    points_from/points_to: (K, 2) float [x, y]; valid: (K,) bool mask (static
    shape, variable trajectory count handled by masking). Returns (H, W, 3)
    float32 in [0, 1]: red line channel, green endpoint channel.

    mode="hard": crisp masks with the cv2 widths (line thickness 3 ~ radius
    1.5, circle r=3). mode="gaussian": exp(-d^2 / 2 sigma^2) soft heatmap.
    """
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width, 1), 1)
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width, 1), 0)
    x0 = points_from[None, None, :, 0]
    y0 = points_from[None, None, :, 1]
    x1 = points_to[None, None, :, 0]
    y1 = points_to[None, None, :, 1]

    d_line_sq = _segment_distance_sq(px, py, x0, y0, x1, y1)  # (H, W, K)
    d_circle_sq = (px - x1) ** 2 + (py - y1) ** 2

    vmask = valid.astype(jnp.float32)[None, None, :]
    if mode == "hard":
        line = (d_line_sq <= (line_width / 2.0) ** 2).astype(jnp.float32)
        circle = (d_circle_sq <= float(circle_radius) ** 2).astype(jnp.float32)
    elif mode == "gaussian":
        line = jnp.exp(-d_line_sq / (2.0 * sigma**2))
        circle = jnp.exp(-d_circle_sq / (2.0 * sigma**2))
    else:
        raise ValueError(mode)

    line = jnp.max(line * vmask, axis=-1)
    circle = jnp.max(circle * vmask, axis=-1)
    # Circles are filled on top of lines (drawn after, dataset.py:761): where a
    # circle covers, green wins over red.
    red = jnp.maximum(line - circle, 0.0) if mode == "hard" else line * (1.0 - circle)
    return jnp.stack([red, circle, jnp.zeros_like(red)], axis=-1)


def rasterize_video_xla(
    trajectories: jax.Array,
    valid: jax.Array,
    num_frames: int,
    height: int,
    width: int,
    mode: str = "hard",
    **kwargs,
) -> jax.Array:
    """(K, num_frames, 2) -> (num_frames, H, W, 3): frame t shows segment
    t->t+1; the last frame is black padding (run_inference...repro.py:448-449).
    vmapped over frames — one fused kernel, no per-frame host loop."""
    seg_from = trajectories[:, : num_frames - 1].transpose(1, 0, 2)  # (F-1, K, 2)
    seg_to = trajectories[:, 1:num_frames].transpose(1, 0, 2)
    frames = jax.vmap(
        lambda a, b: rasterize_xla(a, b, valid, height, width, mode, **kwargs)
    )(seg_from, seg_to)
    black = jnp.zeros((1, height, width, 3), frames.dtype)
    return jnp.concatenate([frames, black], axis=0)
