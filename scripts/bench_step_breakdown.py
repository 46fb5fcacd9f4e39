"""Per-component breakdown of the flagship denoise step on the live TPU.

Times the full CFG denoise step (ControlNet + UNet at 576x1024/f14, the
bench.py hot loop) and its major components standalone, so optimization
effort lands where the milliseconds are. Measurement per NOTES.md: chained
dependent-free calls, clock stopped on a scalar fetch.

Usage: python scripts/bench_step_breakdown.py [--full-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from posetraj_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(min_compile_secs=1.0)


def timed(fn, *args, iters=4):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else None, out)
    s = float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full-only", action="store_true")
    args = ap.parse_args()

    from posetraj_tpu.configs import ControlNetConfig, UNetConfig
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models.transformer import feed_forward, init_feed_forward
    from posetraj_tpu.models.resnet import init_spatio_temporal_res_block, spatio_temporal_res_block
    from posetraj_tpu.ops.attention import attention

    dt = jnp.bfloat16
    B, F, H, W = 2, 14, 72, 128  # CFG x frames x latent 576x1024
    BF = B * F

    unet_cfg = UNetConfig()
    cn_cfg = ControlNetConfig()
    cast = lambda tree: jax.tree_util.tree_map(lambda x: x.astype(dt), tree)
    u_params = cast(unet_m.init_unet(None, unet_cfg))
    c_params = cast(cn.init_controlnet(None, cn_cfg))

    sample = jnp.zeros((B, F, H, W, 8), dt)
    clip_emb = jnp.zeros((B, 1, 1024), dt)
    tids = jnp.asarray([[6.0, 128.0, 0.02]] * B, jnp.float32)
    control = jnp.zeros((B, F, H * 8, W * 8, 3), dt)

    @jax.jit
    def full_step(u_params, c_params, sample):
        down, mid = cn.controlnet_forward(
            c_params, cn_cfg, sample, -1.0, clip_emb, tids,
            controlnet_cond=control, compute_dtype=dt)
        return unet_m.unet_forward(
            u_params, unet_cfg, sample, -1.0, clip_emb, tids, down, mid,
            compute_dtype=dt)

    @jax.jit
    def cn_only(c_params, sample):
        return cn.controlnet_forward(
            c_params, cn_cfg, sample, -1.0, clip_emb, tids,
            controlnet_cond=control, compute_dtype=dt)

    ms, _ = timed(full_step, u_params, c_params, sample)
    print(f"full denoise step (CN+UNet):      {ms * 1e3:8.1f} ms")
    ms_cn, _ = timed(cn_only, c_params, sample)
    print(f"  controlnet half:                {ms_cn * 1e3:8.1f} ms")
    if args.full_only:
        return

    # Per-level shapes: (spatial tokens, channels, heads)
    levels = [
        ("L0", H * W, 320, 5),
        ("L1", (H // 2) * (W // 2), 640, 10),
        ("L2", (H // 4) * (W // 4), 1280, 20),
        ("L3", (H // 8) * (W // 8), 1280, 20),
    ]
    key = jax.random.PRNGKey(0)
    for name, s, c, heads in levels:
        x = jax.random.normal(key, (BF, s, c), dt)
        q = jax.random.normal(key, (BF * heads // heads, s, c), dt)  # (BF, s, c)

        attn = jax.jit(lambda q: attention(q, q, q, num_heads=heads, backend="pallas"))
        ms, _ = timed(attn, x)
        flops = 4 * BF * s * s * c
        print(f"{name} self-attn S={s:5d} C={c}: {ms * 1e3:7.1f} ms  {flops / ms / 1e12:6.1f} TF/s")

        ffp = cast(init_feed_forward(jax.random.PRNGKey(1), c))
        ff = jax.jit(lambda x: feed_forward(ffp, x, dt))
        ms, _ = timed(ff, x)
        flops = 2 * BF * s * c * (8 * c) + 2 * BF * s * (4 * c) * c
        print(f"{name} GEGLU FF:            {ms * 1e3:7.1f} ms  {flops / ms / 1e12:6.1f} TF/s")

    # Resblock at L0 (the conv-path proxy)
    rb = cast(init_spatio_temporal_res_block(jax.random.PRNGKey(2), 320, 320, 1280))
    xr = jax.random.normal(key, (BF, H, W, 320), dt)
    temb = jax.random.normal(key, (BF, 1280), dt)
    rbf = jax.jit(lambda x: spatio_temporal_res_block(rb, x, temb, F, jnp.zeros((B, F)), compute_dtype=dt))
    ms, _ = timed(rbf, xr)
    conv_flops = 2 * BF * H * W * 9 * 320 * 320 * 2 + 2 * B * F * H * W * 3 * 320 * 320 * 2
    print(f"L0 spatio-temporal resblock:   {ms * 1e3:7.1f} ms  (conv-ish {conv_flops / ms / 1e12:5.1f} TF/s)")


if __name__ == "__main__":
    main()
