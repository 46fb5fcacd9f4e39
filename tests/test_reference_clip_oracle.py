"""Reference-parity oracle for the frozen CLIP vision tower, against the REAL
`transformers` library (not a stand-in).

The reference loads CLIPVisionModelWithProjection frozen
(train_svd_traj_blender_14.py:869-873) and consumes `image_embeds`
(pipeline...controlnet.py:156-157). transformers is installed in this image,
so our JAX rebuild (posetraj_tpu/models/clip.py) can be validated directly
against the genuine upstream implementation at a tiny config:

  * converter "clip" name rules must cover the real state_dict exactly, and
  * fp32 image_embeds must agree after weight conversion.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

TINY = dict(
    image_size=32,
    patch_size=8,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    intermediate_size=64,
    projection_dim=16,
)


def _hf_config():
    return transformers.CLIPVisionConfig(
        image_size=TINY["image_size"],
        patch_size=TINY["patch_size"],
        hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        projection_dim=TINY["projection_dim"],
        hidden_act="gelu",  # laion ViT-H uses exact gelu, not quick_gelu
        layer_norm_eps=1e-5,
    )


def _our_config():
    import dataclasses

    from posetraj_tpu.configs import CLIPVisionConfig

    return dataclasses.replace(CLIPVisionConfig(), **TINY)


@pytest.fixture(scope="module")
def torch_clip():
    import torch

    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(_hf_config())
    g = torch.Generator().manual_seed(11)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.ndim == 1 and "layer_norm" in k or "layrnorm" in k:
            sd[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
        else:
            sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)
    model.eval()
    return torch, model


def test_converter_names_cover_real_transformers_state_dict(torch_clip):
    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.tools.convert_weights import convert_to_torch

    _, model = torch_clip
    ours = convert_to_torch(clip_m.init_clip_vision(None, _our_config()), "clip")
    theirs = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    assert set(ours) == set(theirs), (
        sorted(set(theirs) - set(ours))[:10], sorted(set(ours) - set(theirs))[:10])
    for k, v in ours.items():
        assert tuple(v.shape) == theirs[k], (k, v.shape, theirs[k])


def test_image_embeds_match_real_transformers(torch_clip):
    import jax.numpy as jnp

    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.tools.convert_weights import convert_to_jax

    torch, model = torch_clip
    cfg = _our_config()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_to_jax(sd, clip_m.init_clip_vision(None, cfg), "clip")

    g = torch.Generator().manual_seed(5)
    pixels = torch.randn(2, 3, TINY["image_size"], TINY["image_size"], generator=g)
    with torch.no_grad():
        ref = model(pixel_values=pixels).image_embeds.numpy()

    out = clip_m.clip_image_embeds(
        params, cfg, jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1)),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-4)
