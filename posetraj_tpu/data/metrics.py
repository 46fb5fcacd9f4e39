"""Video quality / trajectory-adherence metrics.

The paper (arXiv:2503.16068) evaluates FVD/FID (pretrained-feature metrics —
they need external Inception/I3D weights, exactly why the reference repo only
EXPORTS frame folders for external tooling, run_inference_vipseg_json_repro.py
:307-318) and ObjMC (mean distance between the target trajectory and the
generated object's tracked trajectory). This module provides the weight-free
parts natively:

  * psnr / ssim — reconstruction quality per frame pair
  * objmc — given target points and tracked points (from any point tracker,
    e.g. CoTracker run externally), the paper's mean-pixel-distance metric
  * frame folders remain exportable for external FID/FVD tooling via
    posetraj_tpu/data/export.py
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(max_val**2 / mse)


def ssim(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Global-statistics SSIM (no sliding window) per image/video pair —
    sufficient for relative tracking across training runs."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    var_a, var_b = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
    )


def objmc(target_points: np.ndarray, tracked_points: np.ndarray) -> float:
    """Object Motion Control error: mean Euclidean pixel distance between the
    conditioning trajectory and the tracked trajectory of the generated video.

    target_points/tracked_points: (K, F, 2) pixel coords. Tracking the
    generated video is the caller's job (external point tracker).
    """
    t = np.asarray(target_points, np.float64)
    g = np.asarray(tracked_points, np.float64)
    assert t.shape == g.shape, (t.shape, g.shape)
    return float(np.linalg.norm(t - g, axis=-1).mean())


def video_psnr_ssim(pred: np.ndarray, gt: np.ndarray) -> dict:
    """(F, H, W, 3) in [0,1] -> mean per-frame PSNR/SSIM."""
    ps = [psnr(p, g) for p, g in zip(pred, gt)]
    ss = [ssim(p, g) for p, g in zip(pred, gt)]
    return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}
