"""End-to-end pipeline tests on a tiny bundle (the BASELINE smoke-config
analogue: tiny models, few steps, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetraj_tpu.configs import PipelineConfig
from posetraj_tpu.models import clip as clip_m
from posetraj_tpu.models import controlnet as cn
from posetraj_tpu.models import unet as unet_m
from posetraj_tpu.models import vae as vae_m
from posetraj_tpu.pipeline import ModelBundle, SVDControlNetPipeline


@pytest.fixture(scope="module")
def tiny_pipeline():
    bundle = ModelBundle.tiny()
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet_m.init_unet(key, bundle.unet),
        "controlnet": cn.init_controlnet(key, bundle.controlnet),
        "vae": vae_m.init_vae(key, bundle.vae),
        "clip": clip_m.init_clip_vision(key, bundle.clip),
    }
    return SVDControlNetPipeline(params, bundle)


H, W, F = 64, 64, 2


def test_pipeline_generates_video(tiny_pipeline):
    image = np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32)
    control = np.zeros((1, F, H, W, 3), np.float32)
    out = tiny_pipeline(image, control, height=H, width=W, num_frames=F, num_inference_steps=2, seed=1)
    assert out.shape == (1, F, H, W, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_pipeline_deterministic_same_seed(tiny_pipeline):
    image = np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32)
    control = np.zeros((1, F, H, W, 3), np.float32)
    a = tiny_pipeline(image, control, height=H, width=W, num_frames=F, num_inference_steps=2, seed=7)
    b = tiny_pipeline(image, control, height=H, width=W, num_frames=F, num_inference_steps=2, seed=7)
    np.testing.assert_array_equal(a, b)


def test_pipeline_noise_injection(tiny_pipeline):
    """Injected noise bypasses the internal PRNG — the parity hook for
    cross-framework golden-latent tests."""
    image = np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32)
    control = np.zeros((1, F, H, W, 3), np.float32)
    rng = np.random.RandomState(3)
    noises = {
        "latents": jnp.asarray(rng.randn(1, F, H // 8, W // 8, 4), jnp.float32),
        "image_aug": jnp.asarray(rng.randn(1, H, W, 3), jnp.float32),
    }
    a = tiny_pipeline(image, control, height=H, width=W, num_frames=F, num_inference_steps=2, noises=noises)
    b = tiny_pipeline(image, control, height=H, width=W, num_frames=F, num_inference_steps=2, noises=noises)
    np.testing.assert_array_equal(a, b)


def test_pipeline_latent_output_shape(tiny_pipeline):
    image = np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32)
    control = np.zeros((1, F, H, W, 3), np.float32)
    lat = tiny_pipeline(
        image, control, height=H, width=W, num_frames=F, num_inference_steps=2, output_type="latent"
    )
    assert lat.shape == (1, F, H // 8, W // 8, 4)


def test_control_signal_changes_output_only_when_nonzero_weights(tiny_pipeline):
    """With freshly initialized (zero) ControlNet output heads, the control
    video must have NO effect — the ControlNet starts as an exact no-op."""
    image = np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32)
    control0 = np.zeros((1, F, H, W, 3), np.float32)
    control1 = np.random.RandomState(1).rand(1, F, H, W, 3).astype(np.float32)
    a = tiny_pipeline(image, control0, height=H, width=W, num_frames=F, num_inference_steps=2, seed=5)
    b = tiny_pipeline(image, control1, height=H, width=W, num_frames=F, num_inference_steps=2, seed=5)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pipeline_camera_variant():
    """Camera-disentangled pipeline: camera_cond threads into the hint encoder
    (pipeline...controlnet_cam.py:505-549); zero camera at inference matches
    the reference driver (infer...cam_concat_repro.py:485-488)."""
    bundle = ModelBundle.tiny("cam")
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet_m.init_unet(key, bundle.unet),
        "controlnet": cn.init_controlnet(key, bundle.controlnet),
        "vae": vae_m.init_vae(key, bundle.vae),
        "clip": clip_m.init_clip_vision(key, bundle.clip),
    }
    pipe = SVDControlNetPipeline(params, bundle)
    image = np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32)
    control = np.zeros((1, F, H, W, 3), np.float32)
    cam = np.zeros((1, F, 12), np.float32)
    out = pipe(image, control, height=H, width=W, num_frames=F, num_inference_steps=2,
               camera_cond=cam, seed=2)
    assert out.shape == (1, F, H, W, 3)
    assert np.isfinite(out).all()


def test_pipeline_bbox_variant():
    """Dual-branch bbox hint encoder end-to-end (BASELINE configs[2]):
    nonzero bbox wireframe maps flow through the second branch and change the
    output (controlnet_sdv_bbox.py:110-136)."""
    bundle = ModelBundle.tiny("bbox")
    key = jax.random.PRNGKey(3)
    params = {
        "unet": unet_m.init_unet(key, bundle.unet),
        "controlnet": cn.init_controlnet(key, bundle.controlnet),
        "vae": vae_m.init_vae(key, bundle.vae),
        "clip": clip_m.init_clip_vision(key, bundle.clip),
    }
    # branch 2 and the residual heads end in zero convs (controlnet_sdv_bbox.py
    # zero_module) — give them nonzero weights so the liveness assertion below
    # is meaningful
    co = params["controlnet"]["controlnet_cond_embedding"]["stack_2"]["conv_out"]
    co["kernel"] = jax.random.normal(jax.random.PRNGKey(9), co["kernel"].shape) * 0.05
    for i, zc in enumerate(params["controlnet"]["controlnet_down_blocks"]):
        zc["kernel"] = jax.random.normal(jax.random.PRNGKey(10 + i), zc["kernel"].shape) * 0.05
    pipe = SVDControlNetPipeline(params, bundle)
    image = np.random.RandomState(0).rand(1, H, W, 3).astype(np.float32)
    control = np.random.RandomState(1).rand(1, F, H, W, 3).astype(np.float32)
    bbox = np.zeros((1, F, H, W, 3), np.float32)
    bbox[:, :, 16:48, 16:48] = 1.0  # wireframe-ish nonzero region
    out = pipe(image, control, height=H, width=W, num_frames=F,
               num_inference_steps=2, seed=1, bbox_condition=bbox)
    assert out.shape == (1, F, H, W, 3)
    assert np.isfinite(out).all()
    out_zero = pipe(image, control, height=H, width=W, num_frames=F,
                    num_inference_steps=2, seed=1, bbox_condition=np.zeros_like(bbox))
    assert np.abs(out - out_zero).max() > 0  # second branch is live
