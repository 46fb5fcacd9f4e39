"""Weight-converter round-trip tests: our pytree -> diffusers-layout
state_dict -> back must be the identity, covering every leaf (so the name
rules cover the whole architecture)."""

import jax
import numpy as np
import pytest

from posetraj_tpu.configs import CLIPVisionConfig, ControlNetConfig, UNetConfig, VAEConfig
from posetraj_tpu.core.params import flatten_dict
from posetraj_tpu.models import clip as clip_m
from posetraj_tpu.models import controlnet as cn
from posetraj_tpu.models import unet as unet_m
from posetraj_tpu.models import vae as vae_m
from posetraj_tpu.tools.convert_weights import convert_to_jax, convert_to_torch


def _roundtrip(params, model):
    sd = convert_to_torch(params, model)
    # no duplicate target names (would silently drop weights)
    assert len(sd) == len(flatten_dict(params))
    back = convert_to_jax(sd, params, model, strict=True)
    a, b = flatten_dict(params), flatten_dict(back)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
    return sd


def test_unet_roundtrip_and_names():
    params = unet_m.init_unet(jax.random.PRNGKey(0), UNetConfig.tiny())
    sd = _roundtrip(params, "unet")
    # spot-check diffusers-style names exist
    assert "conv_in.weight" in sd
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in sd
    assert "down_blocks.0.attentions.0.temporal_transformer_blocks.0.ff_in.net.0.proj.weight" in sd
    assert "down_blocks.0.downsamplers.0.conv.weight" in sd
    assert "mid_block.attentions.0.time_mixer.mix_factor" in sd
    assert "up_blocks.3.attentions.2.transformer_blocks.0.ff.net.2.bias" in sd
    assert "time_embedding.linear_1.weight" in sd
    # conv layout: torch OIHW
    assert sd["conv_in.weight"].shape[-2:] == (3, 3)


@pytest.mark.parametrize("variant", ["base", "bbox", "cam", "rot", "entity", "temp"])
def test_controlnet_roundtrip(variant):
    params = cn.init_controlnet(jax.random.PRNGKey(0), ControlNetConfig.tiny(variant))
    sd = _roundtrip(params, "controlnet")
    assert "controlnet_cond_embedding.conv_in.weight" in sd
    assert "controlnet_down_blocks.0.weight" in sd
    assert "controlnet_mid_block.bias" in sd
    if variant == "bbox":
        assert "controlnet_cond_embedding.conv_in_2.weight" in sd
        assert "controlnet_cond_embedding.conv_out_2.weight" in sd
    if variant == "cam":
        assert "controlnet_cond_embedding.cc_projection.weight" in sd
    if variant == "entity":
        assert "controlnet_cond_embedding.conv_in_2.weight" in sd
        assert "controlnet_cond_embedding.conv_out_2.weight" in sd
    if variant == "temp":
        assert "controlnet_cond_embedding.transformer_blocks.0.attn1.to_q.weight" in sd
        assert "controlnet_cond_embedding.proj_in.weight" in sd
        assert "controlnet_cond_embedding.norm.weight" in sd


def test_vae_roundtrip():
    params = vae_m.init_vae(jax.random.PRNGKey(0), VAEConfig.tiny())
    sd = _roundtrip(params, "vae")
    assert "quant_conv.weight" in sd
    assert "encoder.mid_block.attentions.0.to_q.weight" in sd
    assert "decoder.up_blocks.0.resnets.0.spatial_res_block.conv1.weight" in sd
    assert "decoder.time_conv_out.weight" in sd
    assert sd["decoder.time_conv_out.weight"].ndim == 5


def test_clip_roundtrip():
    params = clip_m.init_clip_vision(jax.random.PRNGKey(0), CLIPVisionConfig.tiny())
    sd = _roundtrip(params, "clip")
    assert "vision_model.embeddings.patch_embedding.weight" in sd
    assert "vision_model.pre_layrnorm.weight" in sd  # HF's historical typo
    assert "vision_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "vision_model.encoder.layers.0.mlp.fc1.weight" in sd
    assert "visual_projection.weight" in sd


def test_strict_missing_raises():
    params = unet_m.init_unet(None, UNetConfig.tiny())
    with pytest.raises(KeyError):
        convert_to_jax({}, params, "unet", strict=True)


def test_linear_layout_transposed():
    params = unet_m.init_unet(jax.random.PRNGKey(0), UNetConfig.tiny())
    sd = convert_to_torch(params, "unet")
    ours = np.asarray(params["time_embedding"]["linear_1"]["kernel"])  # (in, out)
    theirs = sd["time_embedding.linear_1.weight"]  # (out, in)
    np.testing.assert_array_equal(theirs, ours.T)
