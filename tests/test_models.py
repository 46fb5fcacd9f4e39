"""Shape/dtype/behavior tests for the model stack on tiny configs.

Model calls are jitted (configs are hashable/static) so each graph compiles
once and lands in the persistent compilation cache.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetraj_tpu.configs import ControlNetConfig, UNetConfig, VAEConfig, CLIPVisionConfig
from posetraj_tpu.core.params import count_params
from posetraj_tpu.models import clip as clip_m
from posetraj_tpu.models import controlnet as cn
from posetraj_tpu.models import unet as unet_m
from posetraj_tpu.models import vae as vae_m

B, F, H, W = 1, 2, 32, 32  # latent-space H, W for UNet tests

_unet_fwd = jax.jit(
    partial(unet_m.unet_forward, compute_dtype=jnp.float32), static_argnums=(1,)
)
_cn_fwd = jax.jit(
    partial(cn.controlnet_forward, compute_dtype=jnp.float32), static_argnums=(1,)
)
_hint = jax.jit(cn.hint_encoder, static_argnums=(1, 3))
_vae_encode = jax.jit(vae_m.encode, static_argnums=(1,))
_vae_decode = jax.jit(vae_m.decode, static_argnums=(1, 3))
_clip_fwd = jax.jit(
    partial(clip_m.clip_image_embeds, compute_dtype=jnp.float32), static_argnums=(1,)
)



@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    params = unet_m.init_unet(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def tiny_controlnet():
    cfg = ControlNetConfig.tiny()
    params = cn.init_controlnet(jax.random.PRNGKey(1), cfg)
    return cfg, params


def _unet_inputs(cfg):
    k = jax.random.PRNGKey(2)
    sample = jax.random.normal(k, (B, F, H, W, cfg.in_channels), jnp.float32)
    t = jnp.asarray([1.5])
    clip_emb = jax.random.normal(k, (B, 1, cfg.cross_attention_dim), jnp.float32)
    time_ids = jnp.asarray([[6.0, 127.0, 0.02]])
    return sample, t, clip_emb, time_ids


def test_unet_forward_shape(tiny_unet):
    cfg, params = tiny_unet
    sample, t, clip_emb, time_ids = _unet_inputs(cfg)
    out = _unet_fwd(params, cfg, sample, t, clip_emb, time_ids)
    assert out.shape == (B, F, H, W, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_controlnet_residual_shapes_and_zero_init(tiny_controlnet):
    """Zero-conv init means residuals are exactly zero at step 0
    (controlnet_sdv.py:860-863) regardless of inputs."""
    cfg, params = tiny_controlnet
    sample, t, clip_emb, time_ids = _unet_inputs(cfg.unet)
    cond = jax.random.uniform(jax.random.PRNGKey(3), (B, F, H * 8, W * 8, 3))
    down_res, mid_res = _cn_fwd(params, cfg, sample, t, clip_emb, time_ids, controlnet_cond=cond)
    # 4 levels x 2 layers + 3 downsamplers + conv_in = 12 residuals
    assert len(down_res) == 12
    boc = cfg.unet.block_out_channels
    assert down_res[0].shape == (B * F, H, W, boc[0])
    assert mid_res.shape == (B * F, H // 8, W // 8, boc[-1])
    for r in down_res:
        np.testing.assert_allclose(np.asarray(r), 0.0)
    np.testing.assert_allclose(np.asarray(mid_res), 0.0)


def test_unet_with_zero_residuals_matches_plain(tiny_unet, tiny_controlnet):
    """Zero residuals must not change the UNet output (fidelity mode included)."""
    cfg, params = tiny_unet
    cn_cfg, cn_params = tiny_controlnet
    sample, t, clip_emb, time_ids = _unet_inputs(cfg)
    cond = jnp.zeros((B, F, H * 8, W * 8, 3))
    down_res, mid_res = _cn_fwd(cn_params, cn_cfg, sample, t, clip_emb, time_ids, controlnet_cond=cond)
    out_plain = _unet_fwd(params, cfg, sample, t, clip_emb, time_ids)
    out_res = _unet_fwd(params, cfg, sample, t, clip_emb, time_ids, down_res, mid_res)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_res), atol=1e-5)


def test_fidelity_residual_in_loop_amplifies(tiny_unet, tiny_controlnet):
    """Q1: with nonzero residuals, fidelity mode differs from clean mode
    (earlier residuals re-added per later down block)."""
    cfg, params = tiny_unet
    cn_cfg, cn_params = tiny_controlnet
    sample, t, clip_emb, time_ids = _unet_inputs(cfg)
    # Fake nonzero residuals with correct shapes.
    down_res, mid_res = _cn_fwd(cn_params, cn_cfg, sample, t, clip_emb, time_ids,
                     controlnet_cond=jnp.zeros((B, F, H * 8, W * 8, 3)))
    key = jax.random.PRNGKey(7)
    down_res = tuple(jax.random.normal(key, r.shape) * 0.1 for r in down_res)
    mid_res = jax.random.normal(key, mid_res.shape) * 0.1

    import dataclasses
    cfg_clean = dataclasses.replace(cfg, fidelity_residual_in_loop=False)
    out_fid = _unet_fwd(params, cfg, sample, t, clip_emb, time_ids, down_res, mid_res)
    out_clean = _unet_fwd(params, cfg_clean, sample, t, clip_emb, time_ids, down_res, mid_res)
    assert np.abs(np.asarray(out_fid) - np.asarray(out_clean)).max() > 1e-6


def test_controlnet_from_unet_copies_encoder(tiny_unet, tiny_controlnet):
    cfg, u_params = tiny_unet
    cn_cfg, cn_params = tiny_controlnet
    merged = cn.controlnet_from_unet(cn_params, u_params)
    a = merged["conv_in"]["kernel"]
    b = u_params["conv_in"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("variant", ["base", "bbox", "cam", "rot", "entity", "temp"])
def test_hint_encoder_variants(variant):
    cfg = ControlNetConfig.tiny(variant)
    params = cn.init_hint_encoder(jax.random.PRNGKey(0), cfg.hint)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (B, F, 64, 64, 3))
    kwargs = {}
    if variant == "bbox":
        kwargs["bbox_cond"] = jnp.zeros_like(cond)
    elif variant == "cam":
        kwargs["camera_cond"] = jnp.ones((B, F, 12))
    elif variant == "rot":
        kwargs["rot_id"] = jnp.zeros((B,), jnp.int32)
    elif variant == "entity":
        kwargs["entity_cond"] = jnp.zeros((1, 8, 8, cfg.hint.embedding_channels))
    out = _hint(params, cfg.hint, cond, F, **kwargs)
    assert out.shape == (B * F, 8, 8, cfg.hint.embedding_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_cam_identity_init_ignores_camera():
    """cc_projection identity/zero init: at step 0 the camera is a no-op
    (train_svd_traj_VIPSeg_14_cam_concat.py:1002-1004)."""
    cfg = ControlNetConfig.tiny("cam")
    params = cn.init_hint_encoder(jax.random.PRNGKey(0), cfg.hint)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (B, F, 64, 64, 3))
    out_zero = _hint(params, cfg.hint, cond, F, camera_cond=jnp.zeros((B, F, 12)))
    out_cam = _hint(params, cfg.hint, cond, F, camera_cond=jnp.ones((B, F, 12)) * 5.0)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_cam), atol=1e-6)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    params = vae_m.init_vae(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (F, 64, 64, 3)) * 2 - 1
    mean, logvar = _vae_encode(params["encoder"], cfg, imgs)
    assert mean.shape == (F, 8, 8, cfg.latent_channels)
    z = vae_m.sample_latent(mean, logvar, jax.random.PRNGKey(2))
    rec = _vae_decode(params["decoder"], cfg, z, F)
    assert rec.shape == (F, 64, 64, 3)
    assert np.isfinite(np.asarray(rec)).all()


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig.tiny()
    params = clip_m.init_clip_vision(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, cfg.image_size, cfg.image_size, 3))
    emb = _clip_fwd(params, cfg, clip_m.clip_preprocess(imgs, cfg))
    assert emb.shape == (2, cfg.projection_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_param_count_full_size_unet():
    """Full-size UNet param count should land near SVD's ~1.5B; guard the
    architecture wiring with a coarse bound. Uses meta init (key=None) so no
    random generation is paid on the single-core CI host."""
    cfg = UNetConfig()
    params = unet_m.init_unet(None, cfg)
    n = count_params(params)
    assert 1.3e9 < n < 1.7e9, f"unexpected UNet param count {n:,}"


def test_temporal_block_layout_equivalence():
    """The (B,F,S,C)-layout temporal block must match the explicit
    transpose-to-(B*S,F,C) formulation (the torch layout)."""
    from posetraj_tpu.models import transformer as tfm
    from posetraj_tpu.ops.primitives import layer_norm

    b, f, s, c, heads = 2, 3, 5, 16, 2
    key = jax.random.PRNGKey(0)
    p = tfm.init_temporal_basic_transformer_block(key, c, heads, cross_attention_dim=c)
    x = jax.random.normal(jax.random.PRNGKey(1), (b * f, s, c))
    ctx_table = jax.random.normal(jax.random.PRNGKey(2), (b, 1, c))  # per-video context
    ctx = jnp.broadcast_to(ctx_table[:, :, None, :], (b, 1, s, c))

    got = tfm.temporal_basic_transformer_block(p, x, f, heads, context=ctx, compute_dtype=jnp.float32)

    # Reference: explicit transpose path.
    xt = x.reshape(b, f, s, c).transpose(0, 2, 1, 3).reshape(b * s, f, c)
    ctx_rows = jnp.repeat(ctx_table, s, axis=0)  # batch-major (B*S, 1, C)
    h = layer_norm(p["norm_in"], xt)
    h = tfm.feed_forward(p["ff_in"], h)
    xt = h + xt
    h = layer_norm(p["norm1"], xt)
    xt = xt + tfm.attention_module(p["attn1"], h, heads, backend="xla")
    h = layer_norm(p["norm2"], xt)
    xt = xt + tfm.attention_module(p["attn2"], h, heads, context=ctx_rows, backend="xla")
    h = layer_norm(p["norm3"], xt)
    xt = xt + tfm.feed_forward(p["ff"], h)
    expect = xt.reshape(b, s, f, c).transpose(0, 2, 1, 3).reshape(b * f, s, c)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5, rtol=2e-5)
