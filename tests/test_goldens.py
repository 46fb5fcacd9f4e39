"""Self-consistency goldens: freeze the numerical behavior of the current
build so future refactors (kernel swaps, layout changes, sharding changes)
are caught the moment they alter results.

These are NOT reference-parity vectors (no reference weights ship with the
repo); they pin OUR deterministic outputs. If a change is *supposed* to alter
numerics (e.g. an epsilon fix during a weight-parity round), regenerate with:

    python -m tests.test_goldens  # rewrites tests/goldens/*.npz
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
ATOL = 2e-4  # fp32 CPU determinism with fusion-order slack


def _compute_goldens():
    from posetraj_tpu.configs import ControlNetConfig, UNetConfig
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m

    cfg = UNetConfig.tiny()
    cn_cfg = ControlNetConfig.tiny()
    unet_params = unet_m.init_unet(jax.random.PRNGKey(0), cfg)
    cn_params = cn.init_controlnet(jax.random.PRNGKey(1), cn_cfg)

    key = jax.random.PRNGKey(2)
    sample = jax.random.normal(key, (1, 2, 16, 16, 8), jnp.float32)
    clip_emb = jax.random.normal(key, (1, 1, cfg.cross_attention_dim), jnp.float32)
    tids = jnp.asarray([[6.0, 128.0, 0.02]])
    cond = jax.random.uniform(jax.random.PRNGKey(3), (1, 2, 128, 128, 3))

    down_res, mid_res = cn.controlnet_forward(
        cn_params, cn_cfg, sample, jnp.asarray([-1.5]), clip_emb, tids,
        controlnet_cond=cond, compute_dtype=jnp.float32,
    )
    # perturb residuals so the UNet's residual path is exercised
    down_res = tuple(r + 0.01 for r in down_res)
    mid_res = mid_res + 0.01
    out = unet_m.unet_forward(
        unet_params, cfg, sample, jnp.asarray([-1.5]), clip_emb, tids,
        down_res, mid_res, compute_dtype=jnp.float32,
    )
    return {
        "unet_out_mean": np.asarray(out.mean()),
        "unet_out_std": np.asarray(out.std()),
        "unet_out_slice": np.asarray(out[0, 0, :4, :4, 0]),
        "mid_res_std": np.asarray(mid_res.std()),
    }


def test_unet_golden_regression():
    path = os.path.join(GOLDEN_DIR, "unet_tiny.npz")
    got = _compute_goldens()
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, **got)
        raise AssertionError("goldens were missing and have been recorded; rerun")
    ref = np.load(path)
    for k in ref.files:
        np.testing.assert_allclose(got[k], ref[k], atol=ATOL, err_msg=k)


if __name__ == "__main__":
    # Goldens are pinned on CPU fp32 (matching the pytest run via conftest);
    # this image's sitecustomize pins JAX_PLATFORMS=axon, so override before
    # any backend initializes.
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez(os.path.join(GOLDEN_DIR, "unet_tiny.npz"), **_compute_goldens())
    print("goldens regenerated on", jax.default_backend())
