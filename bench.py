"""Headline benchmark: denoise steps/sec/chip + sec/video for the flagship
SVD+ControlNet stack.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline (BASELINE.md): <10 s wall-clock for a 14-frame 576x1024 video at 25
Euler-Karras steps on v5e-8. We measure on however many chips are visible
(usually 1) and report sec/video on this host plus the per-chip step rate;
vs_baseline = 10s / measured_sec_video (>1 = beating the single-host target).

On non-TPU hosts (driver smoke runs) it falls back to the 320x576 eval
resolution with a reduced step count and flags "config" accordingly.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    from posetraj_tpu.configs import ControlNetConfig, UNetConfig, VAEConfig
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models import vae as vae_m

    if on_tpu:
        height, width, frames, steps = 576, 1024, 14, 25
        unet_cfg, cn_cfg, vae_cfg = UNetConfig(), ControlNetConfig(), VAEConfig()
        decode_chunk = 7
    else:
        height, width, frames, steps = 64, 64, 2, 2
        unet_cfg, cn_cfg, vae_cfg = UNetConfig.tiny(), ControlNetConfig.tiny(), VAEConfig.tiny()
        decode_chunk = 2

    lat_h, lat_w = height // 8, width // 8
    B = 2  # CFG batch

    cast = lambda tree: jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)
    params = {
        "unet": cast(unet_m.init_unet(None, unet_cfg)),
        "controlnet": cast(cn.init_controlnet(None, cn_cfg)),
    }
    vae_params = cast(vae_m.init_vae(None, vae_cfg))

    @jax.jit
    def denoise_step(params, sample, t, clip_emb, time_ids, control):
        down_res, mid_res = cn.controlnet_forward(
            params["controlnet"], cn_cfg, sample, t, clip_emb, time_ids,
            controlnet_cond=control, compute_dtype=dtype,
        )
        return unet_m.unet_forward(
            params["unet"], unet_cfg, sample, t, clip_emb, time_ids,
            down_res, mid_res, compute_dtype=dtype,
        )

    sample = jnp.zeros((B, frames, lat_h, lat_w, 8), dtype)
    t = jnp.full((B,), -1.0, jnp.float32)
    clip_emb = jnp.zeros((B, 1, unet_cfg.cross_attention_dim), dtype)
    time_ids = jnp.asarray([[6.0, 128.0, 0.02]] * B, jnp.float32)
    control = jnp.zeros((B, frames, height, width, 3), dtype)

    # Warmup/compile
    out = denoise_step(params, sample, t, clip_emb, time_ids, control)
    out.block_until_ready()

    n_iter = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = denoise_step(params, sample, t, clip_emb, time_ids, control)
    out.block_until_ready()
    step_time = (time.perf_counter() - t0) / n_iter
    steps_per_sec = 1.0 / step_time

    # VAE decode timing (chunked, as the pipeline runs it)
    @jax.jit
    def decode(vp, z):
        return vae_m.decode(vp["decoder"], vae_cfg, z, z.shape[0], compute_dtype=dtype)

    z = jnp.zeros((decode_chunk, lat_h, lat_w, vae_cfg.latent_channels), dtype)
    decode(vae_params, z).block_until_ready()
    t0 = time.perf_counter()
    n_chunks = -(-frames // decode_chunk)
    for _ in range(n_chunks):
        r = decode(vae_params, z)
    r.block_until_ready()
    decode_time = time.perf_counter() - t0

    sec_video = steps * step_time + decode_time
    result = {
        "metric": "denoise steps/sec/chip (14f 576x1024 SVD+ControlNet, CFG batch 2)"
        if on_tpu
        else "denoise steps/sec (tiny smoke config, non-TPU host)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(10.0 / sec_video, 4),
        "sec_per_video": round(sec_video, 3),
        "decode_sec": round(decode_time, 3),
        "n_devices": jax.device_count(),
        "backend": jax.default_backend(),
        "config": f"{height}x{width} f{frames} s{steps} {np.dtype(dtype).name}",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
