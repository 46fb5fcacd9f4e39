"""Single-video sharded serving (parallel/serve.py + parallel/spmd.py): the
v5e-8 north-star path validated on the 8-virtual-device CPU mesh.

Covers the three SPMD op contracts (conv halo exchange, GroupNorm psum stats,
attention K/V gather) as unit tests, then the full sharded generate() against
the unsharded program at tiny shapes — both on the flagship (2 cfg x 4 sp)
layout and the degenerate (1, 1) layout that runs on a single real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from posetraj_tpu.core.init import conv_init, norm_init
from posetraj_tpu.ops import primitives
from posetraj_tpu.parallel import spmd
from posetraj_tpu.parallel.serve import generate_sharded, make_serve_mesh
from posetraj_tpu.pipeline.svd_controlnet import (
    ModelBundle,
    PipelineConfig,
    generate,
)


def _sp_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


def _run_sharded_w(fn, mesh, *args, w_axis=-2):
    """Run fn under a W-sharded spmd context: args shard their W axis."""
    n = mesh.shape["sp"]
    ctx = spmd.SpmdCtx(sp_axis="sp", sp_size=n, cfg_axis="cfg", cfg_size=1)

    def body(*local_args):
        with spmd.spatial_sharding(ctx):
            return fn(*local_args)

    ndim = args[0].ndim
    spec = [None] * ndim
    spec[w_axis % ndim] = "sp"
    spec = P(*spec)
    return jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    )(*args)


class TestHaloConv:
    @pytest.mark.parametrize("stride,pad", [(1, ((1, 1), (1, 1))), (2, ((1, 1), (1, 1))),
                                            (2, ((0, 1), (0, 1)))])
    def test_conv_matches_unsharded(self, stride, pad):
        k = jax.random.PRNGKey(0)
        p = conv_init(k, (3, 3, 6, 8))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16, 6), jnp.float32)
        ref = primitives.conv2d(p, x, stride=stride, padding=pad)
        mesh = _sp_mesh(4)
        out = _run_sharded_w(lambda xx: primitives.conv2d(p, xx, stride=stride, padding=pad),
                             mesh, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_conv_same_padding(self):
        k = jax.random.PRNGKey(0)
        p = conv_init(k, (3, 3, 4, 4))
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 8, 4), jnp.float32)
        ref = primitives.conv2d(p, x)  # SAME
        out = _run_sharded_w(lambda xx: primitives.conv2d(p, xx), _sp_mesh(4), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_conv_1x1_no_halo(self):
        k = jax.random.PRNGKey(0)
        p = conv_init(k, (1, 1, 4, 6))
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 4), jnp.float32)
        ref = primitives.conv2d(p, x)
        out = _run_sharded_w(lambda xx: primitives.conv2d(p, xx), _sp_mesh(4), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestShardedGroupNorm:
    def test_stats_psum(self):
        p = norm_init(8)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 8, 8), jnp.float32) * 3 + 1
        ref = primitives.group_norm(p, x, num_groups=4)
        out = _run_sharded_w(lambda xx: primitives.group_norm(p, xx, num_groups=4),
                             _sp_mesh(4), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_group_norm_silu(self):
        p = norm_init(8)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 8, 8), jnp.float32)
        ref = primitives.group_norm_silu(p, x, num_groups=4)
        out = _run_sharded_w(lambda xx: primitives.group_norm_silu(p, xx, num_groups=4),
                             _sp_mesh(4), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


class TestGatheredAttention:
    def test_self_attention_kv_gather(self):
        from posetraj_tpu.ops.attention import attention

        b, s, d, heads = 2, 32, 16, 2
        key = jax.random.PRNGKey(6)
        q, k, v = jax.random.normal(key, (3, b, s, d), jnp.float32)
        ref = attention(q, k, v, heads)

        mesh = _sp_mesh(4)

        def body(q_, k_, v_):
            return attention(q_, k_, v_, heads, gather_kv_axis="sp")

        out = jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=P(None, "sp", None), out_specs=P(None, "sp", None),
                check_vma=False,
            )
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def _tiny_inputs(width=256, height=64, frames=2, steps=2, seed=0):
    from posetraj_tpu.diffusion.euler_karras import make_schedule
    from posetraj_tpu.pipeline.svd_controlnet import added_time_ids_inference

    bundle = ModelBundle.tiny()
    pcfg = PipelineConfig(
        height=height, width=width, num_frames=frames, num_inference_steps=steps,
        decode_chunk_size=1,
    )
    rng = np.random.default_rng(seed)
    image = jnp.asarray(rng.random((1, height, width, 3), np.float32))
    control = jnp.asarray(rng.random((1, frames, height, width, 3), np.float32))
    sf = bundle.vae.scale_factor
    noises = {
        "latents": jnp.asarray(
            rng.standard_normal((1, frames, height // sf, width // sf, 4)).astype(np.float32)
        ),
        "image_aug": jnp.asarray(rng.standard_normal(image.shape).astype(np.float32)),
    }
    sched = make_schedule(bundle.scheduler, steps)
    time_ids = jnp.asarray(added_time_ids_inference(pcfg))
    return bundle, pcfg, image, control, noises, time_ids, sched, frames


@pytest.fixture(scope="module")
def tiny_params():
    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models import vae as vae_m

    bundle = ModelBundle.tiny()
    key = jax.random.PRNGKey(7)
    return {
        "unet": unet_m.init_unet(key, bundle.unet),
        "controlnet": cn.init_controlnet(key, bundle.controlnet),
        "vae": vae_m.init_vae(key, bundle.vae),
        "clip": clip_m.init_clip_vision(key, bundle.clip),
    }


class TestShardedGenerate:
    def test_matches_unsharded_2x4(self, tiny_params):
        bundle, pcfg, image, control, noises, time_ids, sched, frames = _tiny_inputs()
        ref = generate(
            tiny_params, bundle, pcfg, image, control, noises, time_ids,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames,
        )
        mesh = make_serve_mesh(2, 4)
        out = generate_sharded(
            tiny_params, bundle, pcfg, image, control, noises, time_ids,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames, mesh,
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)

    def test_matches_unsharded_1x1(self, tiny_params):
        """The degenerate mesh runs the identical code path on one device —
        this is the configuration used to validate the path on the single
        attached TPU chip."""
        bundle, pcfg, image, control, noises, time_ids, sched, frames = _tiny_inputs()
        ref = generate(
            tiny_params, bundle, pcfg, image, control, noises, time_ids,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames,
        )
        mesh = make_serve_mesh(1, 1, devices=jax.devices()[:1])
        out = generate_sharded(
            tiny_params, bundle, pcfg, image, control, noises, time_ids,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames, mesh,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-3)

    def test_latent_output_matches(self, tiny_params):
        bundle, pcfg, image, control, noises, time_ids, sched, frames = _tiny_inputs()
        ref = generate(
            tiny_params, bundle, pcfg, image, control, noises, time_ids,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames,
            output_latent=True,
        )
        mesh = make_serve_mesh(2, 4)
        out = generate_sharded(
            tiny_params, bundle, pcfg, image, control, noises, time_ids,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames, mesh,
            output_latent=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)

    def test_width_divisibility_guard(self, tiny_params):
        """Level-0 indivisibility is still a hard error (no useful sp layout)."""
        bundle, pcfg, image, control, noises, time_ids, sched, frames = _tiny_inputs()
        import dataclasses

        bad = dataclasses.replace(pcfg, width=104)  # latent 13, not /4
        with pytest.raises(ValueError, match="divide|multiple"):
            generate_sharded(
                tiny_params, bundle, bad, image, control, noises, time_ids,
                jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames,
                make_serve_mesh(2, 4),
            )

    def test_matches_unsharded_replicated_deepest_level(self, tiny_params):
        """Ladder analog of the reference eval resolution: latent W
        24 -> 12 -> 6 -> 3 under sp=2 stops dividing at the deepest level
        (like 320x576's 72 -> 36 -> 18 -> 9), so the downsampler into it
        all-gathers W and the deepest level + mid block run replicated
        (SpmdCtx.replicated_h) — numerics must still match the unsharded
        program."""
        bundle, pcfg, image, control, noises, time_ids, sched, frames = _tiny_inputs(
            width=192, height=64
        )
        from posetraj_tpu.parallel.serve import _check_divisible

        mesh = make_serve_mesh(2, 2, devices=jax.devices()[:4])
        rep_h, rep_s = _check_divisible(pcfg, bundle, frames, mesh)
        assert rep_h == frozenset({1}) and rep_s == frozenset({3}), (rep_h, rep_s)

        ref = generate(
            tiny_params, bundle, pcfg, image, control, noises, time_ids,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames,
        )
        out = generate_sharded(
            tiny_params, bundle, pcfg, image, control, noises, time_ids,
            jnp.asarray(sched.sigmas), jnp.asarray(sched.timesteps), frames, mesh,
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


class TestEvalResolutionLayout:
    """The reference eval config (run_inference_vipseg_json_repro.py:451:
    320x576, 14 frames) must have a multi-chip serving layout."""

    def test_eval_res_layout_cfg2_sp2(self):
        """(cfg=2, sp=2) on 4 chips: levels 0-2 shard W, the 5x9 deepest
        level replicates."""
        from posetraj_tpu.parallel.serve import _check_divisible

        bundle = ModelBundle()  # flagship configs (no params materialized)
        pcfg = PipelineConfig(height=320, width=576, num_frames=14,
                              num_inference_steps=25, decode_chunk_size=2)
        mesh = make_serve_mesh(2, 2, devices=jax.devices()[:4])
        rep_h, rep_s = _check_divisible(pcfg, bundle, 14, mesh)
        assert rep_h == frozenset({5}), rep_h
        assert rep_s == frozenset({45}), rep_s

    def test_eval_res_sp4_is_rejected_as_ambiguous(self):
        """sp=4 at eval res collides (sharded level-1 local S == replicated
        level-2 global S == 180): the guard must refuse rather than silently
        mis-gate collectives."""
        from posetraj_tpu.parallel.serve import _check_divisible

        bundle = ModelBundle()
        pcfg = PipelineConfig(height=320, width=576, num_frames=14,
                              num_inference_steps=25, decode_chunk_size=2)
        mesh = make_serve_mesh(2, 4)
        with pytest.raises(ValueError, match="ambiguous"):
            _check_divisible(pcfg, bundle, 14, mesh)

    def test_flagship_res_all_levels_sharded(self):
        """576x1024 over (2,4): the original fully-sharded layout — the
        replicated sets must stay empty (no behavior change)."""
        from posetraj_tpu.parallel.serve import _check_divisible

        bundle = ModelBundle()
        pcfg = PipelineConfig(height=576, width=1024, num_frames=14,
                              num_inference_steps=25, decode_chunk_size=2)
        mesh = make_serve_mesh(2, 4)
        rep_h, rep_s = _check_divisible(pcfg, bundle, 14, mesh)
        assert rep_h == frozenset() and rep_s == frozenset()
