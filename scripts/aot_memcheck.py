"""AOT-compile the v5e-8 serving program against a REAL 2x4 v5e topology and
report per-chip memory (VERDICT r3 next #4).

The round-3 serving compile check ran on an 8-device CPU mesh, whose memory
accounting reported per-chip temps 20.39 GB vs the v5e's 16 GB HBM — with a
prose argument that CPU-backend accounting historically overshoots. This
script replaces that argument with real-backend numbers: libtpu's compiler is
attached (the axon plugin dlopens it for its own AOT path), and
`jax.experimental.topologies.get_topology_desc("v5e:2x4x1", "tpu")` builds an
8-chip compile-only topology, so the FULL flagship generate_sharded
(576x1024 / 14f / 25 steps over the (cfg=2, sp=4) mesh) can be compiled by
the production TPU compiler without 8 real chips. `memory_analysis()` on the
result is the per-chip figure the real deployment would see.

Run: python scripts/aot_memcheck.py            (flagship, default)
     python scripts/aot_memcheck.py --eval-res (320x576 eval resolution too)
"""

import argparse
import sys

import jax
import jax.numpy as jnp

from posetraj_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(min_compile_secs=1.0)


def build_args(height: int, width: int, steps: int = 25, frames: int = 14,
               decode_chunk: int = 2):
    from posetraj_tpu.diffusion.euler_karras import make_schedule
    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models import vae as vae_m
    from posetraj_tpu.pipeline import svd_controlnet as pipe_m

    bundle = pipe_m.ModelBundle()
    pcfg = pipe_m.PipelineConfig(height=height, width=width, num_frames=frames,
                                 num_inference_steps=steps,
                                 decode_chunk_size=decode_chunk)
    dtype = jnp.bfloat16
    cast = lambda tree: jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, dtype), tree
    )
    params = {
        "unet": cast(jax.eval_shape(lambda: unet_m.init_unet(None, bundle.unet))),
        "controlnet": cast(jax.eval_shape(lambda: cn.init_controlnet(None, bundle.controlnet))),
        "vae": cast(jax.eval_shape(lambda: vae_m.init_vae(None, bundle.vae))),
        "clip": cast(jax.eval_shape(lambda: clip_m.init_clip_vision(None, bundle.clip))),
    }
    sched = make_schedule(bundle.scheduler, steps)
    sf = bundle.vae.scale_factor
    f32 = jnp.float32
    return bundle, pcfg, (
        params,
        jax.ShapeDtypeStruct((1, height, width, 3), f32),
        jax.ShapeDtypeStruct((1, frames, height, width, 3), f32),
        {"latents": jax.ShapeDtypeStruct((1, frames, height // sf, width // sf, 4), f32),
         "image_aug": jax.ShapeDtypeStruct((1, height, width, 3), f32)},
        jax.ShapeDtypeStruct((1, 3), f32),
        jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps),
    )


def aot_compile_serving(height: int, width: int, topology: str = "v5e:2x4x1"):
    """Compile generate_sharded for the given topology; return (compiled, stats)."""
    from jax.experimental import topologies

    from posetraj_tpu.parallel.serve import generate_sharded, make_serve_mesh

    topo = topologies.get_topology_desc(topology, "tpu")
    n = len(topo.devices)
    mesh = make_serve_mesh(2, n // 2, devices=topo.devices)
    bundle, pcfg, args = build_args(height, width)
    params, image, control, noises, tids, sigmas, timesteps = args
    lowered = generate_sharded.lower(
        params, bundle, pcfg, image, control, noises, tids,
        sigmas, timesteps, pcfg.num_frames, mesh,
    )
    compiled = lowered.compile()
    return compiled, compiled.memory_analysis()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--topology", default="v5e:2x4x1")
    p.add_argument("--eval-res", action="store_true",
                   help="also compile the 320x576 eval resolution")
    args = p.parse_args(argv)

    shapes = [(576, 1024)] + ([(320, 576)] if args.eval_res else [])
    ok = True
    for h, w in shapes:
        print(f"[aot-memcheck] compiling generate_sharded {h}x{w} for "
              f"{args.topology} ...", file=sys.stderr)
        try:
            _, stats = aot_compile_serving(h, w, args.topology)
        except Exception as e:  # noqa: BLE001 — report, keep going
            print(f"[aot-memcheck] {h}x{w} FAILED: {type(e).__name__}: "
                  f"{str(e)[:400]}")
            ok = False
            continue
        gb = 1e9
        total = (stats.argument_size_in_bytes + stats.temp_size_in_bytes
                 + stats.output_size_in_bytes)
        print(
            f"[aot-memcheck] {h}x{w} over {args.topology}: per-chip "
            f"args {stats.argument_size_in_bytes / gb:.2f} GB + "
            f"temps {stats.temp_size_in_bytes / gb:.2f} GB + "
            f"out {stats.output_size_in_bytes / gb:.2f} GB = {total / gb:.2f} GB "
            f"(v5e HBM 16 GB) {'FITS' if total <= 16e9 else 'OVER'}"
        )
        ok = ok and total <= 16e9
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
