"""Golden-latent parity gate: ONE command that proves a converted checkpoint
generates the same latents as the reference implementation.

    python -m posetraj_tpu.tools.parity_gate /path/to/svd-checkpoint \\
        [--controlnet /path/to/posetraj-checkpoint/controlnet] \\
        [--height 256 --width 384 --frames 14 --steps 4] [--out latents.npz]

What it does (BASELINE.json configs[0]; VERDICT round-2 next #3):
  1. `verify_against_expected`: diff every config.json against the recorded
     constants (tools/hub_configs.py EXPECTED) — hard-fails on divergence
     unless --allow-config-divergence.
  2. Builds our typed configs FROM the checkpoint's config.json files
     (from_pretrained-equivalent override semantics) and converts the weights
     (tools/convert_weights.py) into meta-init templates.
  3. Runs our jitted pipeline on fully deterministic inputs with INJECTED
     noise (the pipeline's noise-injection hook) and saves the latents.
  4. When torch + diffusers are importable, builds the REFERENCE pipeline
     from the reference repo's own files (pipeline_stable_video_diffusion_
     controlnet.py:316, constructed the way run_inference_vipseg_json_repro.
     py:335-338 does), runs it on the SAME noise, and asserts latent
     agreement within --tolerance.

The torch branch needs `diffusers` importable: either the real package, or
the test-only stand-in under tests/ref_oracle (the gate's own test drives the
full compare loop through the stand-in, so the procedure is proven before
real weights are obtainable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, Optional

import numpy as np

from posetraj_tpu.configs import ControlNetConfig, HintEncoderConfig
from posetraj_tpu.tools import hub_configs as hc
from posetraj_tpu.tools.convert_weights import convert_to_jax, load_diffusers_model_dir


# ---------------------------------------------------------------------------
# Deterministic inputs
# ---------------------------------------------------------------------------


def make_gate_inputs(height: int, width: int, frames: int, seed: int):
    """Deterministic image / control video / noises shared by both sides.

    Noise is drawn with torch when available (so the reference pipeline can
    consume the identical generator stream), else numpy. Returned noises are
    channels-last for our pipeline; the torch branch re-derives its layouts.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    image = np.stack(
        [yy / height, xx / width, (yy + xx) / (height + width)], axis=-1
    )[None]  # (1, H, W, 3) smooth gradient in [0, 1]
    # Quantize to the uint8 grid ONCE so the PIL round-trip on the torch side
    # sees bit-identical pixels to the float array our side consumes.
    image = np.round(image * 255.0) / 255.0
    # Control video: a bright diagonal streak sweeping across frames (stand-in
    # for a rasterized trajectory map; content is irrelevant to parity).
    control = np.zeros((1, frames, height, width, 3), np.float32)
    for f in range(frames):
        c = int((f + 1) * width / (frames + 1))
        control[0, f, :, max(0, c - 2) : c + 2, 0] = 1.0

    try:
        import torch

        g_aug = torch.Generator().manual_seed(seed)
        aug = torch.randn((1, 3, height, width), generator=g_aug).numpy()
        g_lat = torch.Generator().manual_seed(seed + 1)
        lat = torch.randn((1, frames, 4, height // 8, width // 8), generator=g_lat).numpy()
    except ImportError:
        aug = rng.standard_normal((1, 3, height, width)).astype(np.float32)
        lat = rng.standard_normal((1, frames, 4, height // 8, width // 8)).astype(np.float32)

    noises = {
        "image_aug": np.ascontiguousarray(aug.transpose(0, 2, 3, 1)),
        "latents": np.ascontiguousarray(lat.transpose(0, 1, 3, 4, 2)),
    }
    return image, control, noises, {"aug_nchw": aug, "lat_ncfhw": lat}


def controlnet_config_from_json(cfg: Dict, unet_cfg) -> ControlNetConfig:
    """ControlNetConfig from a controlnet checkpoint's config.json
    (ControlNetSDVModel registers conditioning_embedding_out_channels,
    controlnet_sdv.py:201-240)."""
    hint = HintEncoderConfig(
        block_out_channels=tuple(
            cfg.get("conditioning_embedding_out_channels", (16, 32, 96, 256))
        ),
        conditioning_channels=cfg.get("conditioning_channels", 3),
        embedding_channels=unet_cfg.block_out_channels[0],
    )
    return ControlNetConfig(unet=unet_cfg, hint=hint)


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------


def run_ours(
    checkpoint_dir: str,
    controlnet_dir: Optional[str],
    height: int,
    width: int,
    frames: int,
    steps: int,
    seed: int,
) -> np.ndarray:
    import jax.numpy as jnp

    from posetraj_tpu.diffusion.euler_karras import make_schedule
    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models import vae as vae_m
    from posetraj_tpu.pipeline.svd_controlnet import (
        ModelBundle,
        PipelineConfig,
        added_time_ids_inference,
        generate,
    )

    unet_cfg = hc.unet_config_from_json(hc.load_config_json(checkpoint_dir, "unet"))
    vae_cfg = hc.vae_config_from_json(hc.load_config_json(checkpoint_dir, "vae"))
    clip_cfg = hc.clip_config_from_json(hc.load_config_json(checkpoint_dir, "image_encoder"))
    sched_cfg = hc.scheduler_config_from_json(hc.load_config_json(checkpoint_dir, "scheduler"))
    cn_dir = controlnet_dir or os.path.join(checkpoint_dir, "controlnet")
    with open(os.path.join(cn_dir, "config.json")) as f:
        cn_cfg = controlnet_config_from_json(json.load(f), unet_cfg)

    # Meta-init templates (zero params, shapes only) -> strict conversion.
    params = {
        "unet": convert_to_jax(
            load_diffusers_model_dir(os.path.join(checkpoint_dir, "unet")),
            unet_m.init_unet(None, unet_cfg), "unet",
        ),
        "controlnet": convert_to_jax(
            load_diffusers_model_dir(cn_dir),
            cn.init_controlnet(None, cn_cfg), "controlnet",
        ),
        "vae": convert_to_jax(
            load_diffusers_model_dir(os.path.join(checkpoint_dir, "vae")),
            vae_m.init_vae(None, vae_cfg), "vae",
        ),
        "clip": convert_to_jax(
            load_diffusers_model_dir(os.path.join(checkpoint_dir, "image_encoder")),
            clip_m.init_clip_vision(None, clip_cfg), "clip",
        ),
    }
    bundle = ModelBundle(
        unet=unet_cfg, controlnet=cn_cfg, vae=vae_cfg, clip=clip_cfg, scheduler=sched_cfg
    )
    pcfg = PipelineConfig(
        height=height, width=width, num_frames=frames, num_inference_steps=steps,
        decode_chunk_size=frames,
    )
    image, control, noises, _ = make_gate_inputs(height, width, frames, seed)
    sched = make_schedule(sched_cfg, steps)
    latents = generate(
        params, bundle, pcfg,
        jnp.asarray(image), jnp.asarray(control),
        {k: jnp.asarray(v) for k, v in noises.items()},
        jnp.asarray(added_time_ids_inference(pcfg)),
        jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps),
        frames, output_latent=True,
    )
    return np.asarray(latents)  # (1, F, h, w, 4)


# ---------------------------------------------------------------------------
# Reference side (torch + diffusers required)
# ---------------------------------------------------------------------------


def run_reference(
    checkpoint_dir: str,
    controlnet_dir: Optional[str],
    height: int,
    width: int,
    frames: int,
    steps: int,
    seed: int,
    reference_repo: str = "/root/reference",
) -> np.ndarray:
    """Execute the reference's OWN pipeline file on the same inputs.

    Mirrors run_inference_vipseg_json_repro.py:335-338's from_pretrained
    assembly via from_config + load_state_dict (hub-machinery-free, so it
    also runs under the tests/ref_oracle diffusers stand-in)."""
    import torch
    from PIL import Image

    if reference_repo not in sys.path:
        sys.path.insert(0, reference_repo)
    sys.path.insert(0, os.path.join(reference_repo, "pipeline"))
    try:
        from transformers import CLIPImageProcessor, CLIPVisionModelWithProjection

        from pipeline_stable_video_diffusion_controlnet import (
            StableVideoDiffusionPipelineControlNet,
        )
        from models.controlnet_sdv import ControlNetSDVModel
        from models.unet_spatio_temporal_condition_controlnet import (
            UNetSpatioTemporalConditionControlNetModel,
        )
        from utils.scheduling_euler_discrete_karras_fix import EulerDiscreteScheduler
        from diffusers.models import AutoencoderKLTemporalDecoder
    finally:
        sys.path.pop(0)

    def build(cls, subdir):
        with open(os.path.join(subdir, "config.json")) as f:
            cfg = json.load(f)
        model = cls.from_config({k: v for k, v in cfg.items() if not k.startswith("_")})
        sd = {
            k: torch.from_numpy(np.asarray(v))
            for k, v in load_diffusers_model_dir(subdir).items()
        }
        model.load_state_dict(sd)
        return model.eval()

    cn_dir = controlnet_dir or os.path.join(checkpoint_dir, "controlnet")
    unet = build(UNetSpatioTemporalConditionControlNetModel, os.path.join(checkpoint_dir, "unet"))
    cnet = build(ControlNetSDVModel, cn_dir)
    vae = build(AutoencoderKLTemporalDecoder, os.path.join(checkpoint_dir, "vae"))
    image_encoder = CLIPVisionModelWithProjection.from_pretrained(
        checkpoint_dir, subfolder="image_encoder"
    ).eval()
    with open(os.path.join(checkpoint_dir, "scheduler", "scheduler_config.json")) as f:
        scheduler = EulerDiscreteScheduler.from_config(
            {k: v for k, v in json.load(f).items() if not k.startswith("_")}
        )

    pipe = StableVideoDiffusionPipelineControlNet(
        vae=vae, image_encoder=image_encoder, unet=unet, controlnet=cnet,
        scheduler=scheduler, feature_extractor=CLIPImageProcessor(),
    )

    image, control, _, torch_noise = make_gate_inputs(height, width, frames, seed)
    image_pil = Image.fromarray((image[0] * 255).round().astype(np.uint8))
    control_t = torch.from_numpy(
        np.ascontiguousarray(control[0].transpose(0, 3, 1, 2))
    )  # (F, 3, H, W) in [0, 1]

    out = pipe(
        image_pil,
        controlnet_condition=control_t,
        height=height, width=width, num_frames=frames,
        num_inference_steps=steps, decode_chunk_size=frames,
        generator=torch.Generator().manual_seed(seed),  # consumed by the aug-noise draw
        latents=torch.from_numpy(torch_noise["lat_ncfhw"]),
        output_type="latent", return_dict=False,
    )
    lat = out.detach().cpu().float().numpy()  # (1, F, 4, h, w)
    return np.ascontiguousarray(lat.transpose(0, 1, 3, 4, 2))


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("checkpoint_dir", help="SVD checkpoint directory (diffusers layout)")
    ap.add_argument("--controlnet", default=None,
                    help="ControlNet dir (default: <checkpoint_dir>/controlnet)")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tolerance", type=float, default=5e-2,
                    help="max |ours - reference| on final latents")
    ap.add_argument("--out", default=None, help="save latents to this .npz")
    ap.add_argument("--skip-reference", action="store_true",
                    help="only run our pipeline (no torch comparison)")
    ap.add_argument("--allow-config-divergence", action="store_true")
    ap.add_argument("--reference-repo", default="/root/reference")
    args = ap.parse_args(argv)

    issues = hc.verify_against_expected(args.checkpoint_dir)
    for line in issues:
        print("config divergence:", line)
    if issues and not args.allow_config_divergence:
        print("FAIL: config.json diverges from recorded constants "
              "(fix tools/hub_configs.py EXPECTED + configs.py, or pass "
              "--allow-config-divergence for a non-SVD checkpoint)")
        return 1

    ours = run_ours(args.checkpoint_dir, args.controlnet, args.height, args.width,
                    args.frames, args.steps, args.seed)
    print(f"ours: latents {ours.shape} mean={ours.mean():+.5f} std={ours.std():.5f}")

    theirs = None
    if not args.skip_reference:
        try:
            theirs = run_reference(
                args.checkpoint_dir, args.controlnet, args.height, args.width,
                args.frames, args.steps, args.seed, args.reference_repo,
            )
        except ImportError as e:
            print(f"reference branch unavailable (torch/diffusers): {e}")

    if args.out:
        data = {"ours": ours}
        if theirs is not None:
            data["reference"] = theirs
        np.savez(args.out, **data)
        print("saved", args.out)

    if theirs is not None:
        diff = np.abs(ours - theirs)
        print(f"reference: latents {theirs.shape} mean={theirs.mean():+.5f} "
              f"std={theirs.std():.5f}")
        print(f"|diff| max={diff.max():.6f} mean={diff.mean():.6f}")
        if diff.max() > args.tolerance:
            print(f"FAIL: max diff {diff.max():.6f} > tolerance {args.tolerance}")
            return 1
        print("PASS: latents agree within tolerance")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
