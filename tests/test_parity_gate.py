"""End-to-end proof of tools/parity_gate.py BEFORE real weights exist.

Builds a complete fake checkpoint directory (diffusers layout: config.json +
weight files per subfolder) from tiny randomized models, then drives the
gate's full compare loop: config verification -> config-from-json build ->
weight conversion -> our jitted pipeline -> the REFERENCE repo's own pipeline
file executed in torch (on the tests/ref_oracle diffusers stand-in) -> latent
agreement. When a real SVD/PoseTraj checkpoint becomes available, the exact
same command applies (BASELINE configs[0], VERDICT round-2 next #3).
"""

import json
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference"
STUB_DIR = os.path.join(os.path.dirname(__file__), "ref_oracle")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DIR, "models")),
    reason="reference checkout not available",
)

H, W, F, STEPS = 64, 64, 2, 2

UNET_CFG = {
    "in_channels": 8,
    "out_channels": 4,
    "block_out_channels": [32, 64, 64, 64],
    "num_attention_heads": [2, 4, 4, 4],
    "cross_attention_dim": 16,
    "addition_time_embed_dim": 8,
    "projection_class_embeddings_input_dim": 24,
    "num_frames": F,
    "layers_per_block": 2,
    "transformer_layers_per_block": 1,
    "sample_size": 8,
    "down_block_types": [
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    ],
    "up_block_types": [
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    ],
}
VAE_CFG = {
    "in_channels": 3,
    "out_channels": 3,
    "latent_channels": 4,
    "block_out_channels": [32, 32, 32, 32],  # torch GroupNorm needs C % 32 == 0
    "layers_per_block": 1,
    "scaling_factor": 0.18215,
    "force_upcast": True,
}
SCHED_CFG = {
    "num_train_timesteps": 1000,
    "beta_start": 0.00085,
    "beta_end": 0.012,
    "beta_schedule": "scaled_linear",
    "prediction_type": "v_prediction",
    "timestep_type": "continuous",
    "timestep_spacing": "leading",
    "interpolation_type": "linear",
    "use_karras_sigmas": True,
    "sigma_min": 0.002,
    "sigma_max": 700.0,
    "steps_offset": 1,
    "trained_betas": None,
}


def _randomize(module, torch, seed):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.ndim == 1 and ("norm" in k or k.endswith("mix_factor")):
            sd[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
        else:
            sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    module.load_state_dict(sd)
    return module


@pytest.fixture(scope="module")
def fake_checkpoint(tmp_path_factory):
    """A complete diffusers-layout checkpoint dir with tiny randomized
    weights, produced by the reference's own model classes."""
    sys.path.insert(0, STUB_DIR)
    sys.path.insert(0, REF_DIR)
    try:
        import torch
        from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

        from models.controlnet_sdv import ControlNetSDVModel
        from models.unet_spatio_temporal_condition_controlnet import (
            UNetSpatioTemporalConditionControlNetModel,
        )
        from diffusers.models import AutoencoderKLTemporalDecoder

        root = tmp_path_factory.mktemp("ckpt")

        def dump(sub, cfg, module=None, cfg_name="config.json"):
            d = root / sub
            d.mkdir(exist_ok=True)
            (d / cfg_name).write_text(json.dumps(cfg))
            if module is not None:
                torch.save(module.state_dict(), d / "diffusion_pytorch_model.bin")

        unet = _randomize(
            UNetSpatioTemporalConditionControlNetModel.from_config(UNET_CFG), torch, 10
        )
        dump("unet", UNET_CFG, unet)

        cn_cfg = {**UNET_CFG, "conditioning_channels": 3,
                  "conditioning_embedding_out_channels": [4, 8, 8, 16]}
        cn_cfg.pop("up_block_types")
        cnet = _randomize(ControlNetSDVModel.from_config(cn_cfg), torch, 11)
        dump("controlnet", cn_cfg, cnet)

        vae = _randomize(AutoencoderKLTemporalDecoder.from_config(VAE_CFG), torch, 12)
        dump("vae", VAE_CFG, vae)

        dump("scheduler", SCHED_CFG, cfg_name="scheduler_config.json")

        clip_cfg = CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=224, patch_size=32,
            projection_dim=16, hidden_act="gelu",
        )
        clip = CLIPVisionModelWithProjection(clip_cfg)
        clip.save_pretrained(root / "image_encoder")

        yield str(root)
    finally:
        sys.path.remove(STUB_DIR)
        sys.path.remove(REF_DIR)


def test_gate_ours_only(fake_checkpoint):
    """The --skip-reference path: configs from json -> conversion -> our
    pipeline latents, deterministic across runs."""
    from posetraj_tpu.tools.parity_gate import run_ours

    lat1 = run_ours(fake_checkpoint, None, H, W, F, STEPS, seed=0)
    lat2 = run_ours(fake_checkpoint, None, H, W, F, STEPS, seed=0)
    assert lat1.shape == (1, F, H // 8, W // 8, 4)
    assert np.isfinite(lat1).all()
    np.testing.assert_array_equal(lat1, lat2)


def test_gate_full_compare(fake_checkpoint):
    """The complete gate command against the reference pipeline executing on
    the diffusers stand-in: must PASS (exit 0) at fp32 tolerance."""
    from posetraj_tpu.tools import parity_gate

    sys.path.insert(0, STUB_DIR)
    try:
        rc = parity_gate.main([
            fake_checkpoint,
            "--height", str(H), "--width", str(W),
            "--frames", str(F), "--steps", str(STEPS),
            "--tolerance", "2e-2",
            "--allow-config-divergence",  # tiny configs != recorded SVD constants
            "--reference-repo", REF_DIR,
        ])
    finally:
        sys.path.remove(STUB_DIR)
    assert rc == 0


def test_gate_rejects_config_divergence(fake_checkpoint):
    """Without --allow-config-divergence a non-SVD checkpoint must fail."""
    from posetraj_tpu.tools import parity_gate

    rc = parity_gate.main([
        fake_checkpoint,
        "--height", str(H), "--width", str(W),
        "--frames", str(F), "--steps", str(STEPS),
        "--skip-reference",
    ])
    assert rc == 1


@pytest.mark.slow
def test_gate_full_compare_eval_resolution(fake_checkpoint):
    """The gate at the REFERENCE EVAL SHAPE — 320x576, 14 frames
    (run_inference_vipseg_json_repro.py:451's config), 4 steps — against the
    reference pipeline on the diffusers stand-in (VERDICT r3 missing #2:
    tiny-shape agreement does not rule out resolution-dependent drift in the
    resize/antialias/latent-broadcast paths)."""
    from posetraj_tpu.tools import parity_gate

    sys.path.insert(0, STUB_DIR)
    try:
        rc = parity_gate.main([
            fake_checkpoint,
            "--height", "320", "--width", "576",
            "--frames", "14", "--steps", "4",
            "--tolerance", "2e-2",
            "--allow-config-divergence",  # tiny configs != recorded SVD constants
            "--reference-repo", REF_DIR,
        ])
    finally:
        sys.path.remove(STUB_DIR)
    assert rc == 0
