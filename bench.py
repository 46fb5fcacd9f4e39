"""Headline benchmark: sec/video + denoise steps/sec/chip for the flagship
SVD+ControlNet stack.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Measurement notes for this environment: the TPU is reached through a tunnel
where dispatch is async and only value reads synchronize, so the whole
denoise loop runs ON DEVICE as one lax.scan (exactly the pipeline's structure)
and the clock stops on a scalar fetch. Steps/sec is derived from the delta
between a 25-step and a 1-step program, cancelling fixed dispatch overhead.

Baseline (BASELINE.md): <10 s wall-clock for a 14-frame 576x1024 video at 25
Euler-Karras steps on v5e-8; we measure on the visible chips (usually 1) and
report vs_baseline = 10 / sec_per_video.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    from posetraj_tpu.configs import ControlNetConfig, SchedulerConfig, UNetConfig, VAEConfig
    from posetraj_tpu.diffusion import make_schedule, euler_step
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
    B = 1  # one video (CFG doubles inside)

    cast = lambda tree: jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)
    params = {
        "unet": cast(unet_m.init_unet(None, unet_cfg)),
        "controlnet": cast(cn.init_controlnet(None, cn_cfg)),
    }
    vae_params = cast(vae_m.init_vae(None, vae_cfg))

    sched = make_schedule(SchedulerConfig(), steps)
    sigmas = jnp.asarray(sched.sigmas)
    timesteps = jnp.asarray(sched.timesteps)

    clip_emb = jnp.zeros((2 * B, 1, unet_cfg.cross_attention_dim), dtype)
    time_ids = jnp.asarray([[6.0, 128.0, 0.02]] * 2 * B, jnp.float32)
    control = jnp.zeros((2 * B, frames, height, width, 3), dtype)
    img_lat = jnp.zeros((2 * B, frames, lat_h, lat_w, 4), dtype)
    lat0 = jnp.ones((B, frames, lat_h, lat_w, 4), jnp.float32) * sched.init_noise_sigma

    @functools.partial(jax.jit, static_argnames=("k",))
    def denoise(params, latents, k):
        def body(lat, step):
            sigma, sigma_next, t = step
            lat_in = jnp.concatenate([lat, lat], axis=0)
            lat_in = (lat_in / jnp.sqrt(sigma**2 + 1.0)).astype(dtype)
            lat_in = jnp.concatenate([lat_in, img_lat], axis=-1)
            dr, mr = cn.controlnet_forward(
                params["controlnet"], cn_cfg, lat_in, t, clip_emb, time_ids,
                controlnet_cond=control, compute_dtype=dtype,
            )
            pred = unet_m.unet_forward(
                params["unet"], unet_cfg, lat_in, t, clip_emb, time_ids, dr, mr,
                compute_dtype=dtype,
            ).astype(jnp.float32)
            uncond, cond = pred[:B], pred[B:]
            pred = uncond + 2.0 * (cond - uncond)
            new_lat, _ = euler_step(pred, lat, sigma, sigma_next, "v_prediction")
            return new_lat, None

        seq = (sigmas[:k], sigmas[1 : k + 1], timesteps[:k])
        out, _ = jax.lax.scan(body, latents, seq)
        return out.sum()

    @jax.jit
    def decode(vp, z):
        return vae_m.decode(vp["decoder"], vae_cfg, z, z.shape[0], compute_dtype=dtype).sum()

    def timed(fn, *a, **kw):
        t0 = time.perf_counter()
        v = float(fn(*a, **kw))
        return time.perf_counter() - t0, v

    import sys

    # Warmup (compile + first-execution session overhead), then measure.
    w1, _ = timed(denoise, params, lat0, k=1)
    wk, _ = timed(denoise, params, lat0, k=steps)
    t1, _ = timed(denoise, params, lat0, k=1)
    tk, _ = timed(denoise, params, lat0, k=steps)
    print(f"[bench] warm1={w1:.1f}s warmk={wk:.1f}s t1={t1:.3f}s tk={tk:.3f}s", file=sys.stderr)
    step_time = max(tk - t1, 1e-9) / (steps - 1)
    steps_per_sec = 1.0 / step_time

    # Release denoise params/graph buffers before the VAE decode graph
    # allocates its full-resolution activations.
    del params
    jax.clear_caches()

    z = jnp.zeros((decode_chunk, lat_h, lat_w, vae_cfg.latent_channels), dtype)
    timed(decode, vae_params, z)
    n_chunks = -(-frames // decode_chunk)
    td, _ = timed(decode, vae_params, z)
    decode_time = td * n_chunks
    print(f"[bench] decode chunk={decode_chunk} td={td:.3f}s", file=sys.stderr)

    sec_video = steps * step_time + decode_time
    result = {
        "metric": "sec/video (14f 576x1024 SVD+ControlNet, 25 Euler-Karras steps, CFG)"
        if on_tpu
        else "sec/video (tiny smoke config, non-TPU host)",
        "value": round(sec_video, 3),
        "unit": "sec",
        "vs_baseline": round(10.0 / sec_video, 4),
        "denoise_steps_per_sec_per_chip": round(steps_per_sec, 4),
        "decode_sec": round(decode_time, 4),
        "n_devices": jax.device_count(),
        "backend": jax.default_backend(),
        "config": f"{height}x{width} f{frames} s{steps} {np.dtype(dtype).name}",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
