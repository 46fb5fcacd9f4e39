"""Pod-scale batched serving: the full pipeline sharded over a (data, model)
mesh on the 8 virtual CPU devices (BASELINE configs[4])."""

import jax
import numpy as np
import pytest

from posetraj_tpu.models import clip as clip_m
from posetraj_tpu.models import controlnet as cn
from posetraj_tpu.models import unet as unet_m
from posetraj_tpu.models import vae as vae_m
from posetraj_tpu.parallel import make_mesh
from posetraj_tpu.pipeline import ModelBundle, SVDControlNetPipeline

H, W, F = 64, 64, 2


@pytest.fixture(scope="module")
def params_bundle():
    bundle = ModelBundle.tiny()
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet_m.init_unet(key, bundle.unet),
        "controlnet": cn.init_controlnet(key, bundle.controlnet),
        "vae": vae_m.init_vae(key, bundle.vae),
        "clip": clip_m.init_clip_vision(key, bundle.clip),
    }
    return params, bundle


def test_sharded_batched_serving_matches_single(params_bundle):
    params, bundle = params_bundle
    assert jax.device_count() >= 8
    image = np.random.RandomState(0).rand(4, H, W, 3).astype(np.float32)
    control = np.zeros((4, F, H, W, 3), np.float32)

    single = SVDControlNetPipeline(params, bundle)
    out_single = single(image, control, height=H, width=W, num_frames=F,
                        num_inference_steps=2, seed=3)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = SVDControlNetPipeline(params, bundle, mesh=mesh)
    out_sharded = sharded(image, control, height=H, width=W, num_frames=F,
                          num_inference_steps=2, seed=3)

    assert out_sharded.shape == (4, F, H, W, 3)
    np.testing.assert_allclose(out_sharded, out_single, atol=2e-3)
