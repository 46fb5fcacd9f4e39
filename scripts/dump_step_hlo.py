"""Dump the optimized HLO of the flagship denoise step (same program as
scripts/profile_step.py) so trace op names (fusion.N) can be mapped back to
the HLO instructions they execute. PERF workflow: profile -> bucket ->
look up the big fusions here -> decide kernel/layout fixes.

Usage: python scripts/dump_step_hlo.py [--out /tmp/step_hlo.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from posetraj_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(min_compile_secs=1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    args = ap.parse_args()

    from posetraj_tpu.configs import ControlNetConfig, UNetConfig
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m

    dt = jnp.bfloat16
    B, F, H, W = 2, 14, 72, 128
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

    compiled = full_step.lower(u_params, c_params, sample).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {args.out}")


if __name__ == "__main__":
    main()
