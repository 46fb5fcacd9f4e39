"""Single-video sharded serving: the v5e-8 north-star path.

BASELINE.md's headline target is ONE 14-frame 576x1024 video in <10 s on a
v5e-8 — batch sharding (pipeline/svd_controlnet.py `mesh=`) cannot help there
because there is only one video. This module shards the *inside* of the
denoise step over a ("cfg", "sp") mesh:

  cfg (2):  the classifier-free-guidance pair — the uncond and cond
            UNet+ControlNet branches run on disjoint chips; the per-frame
            guidance combine `uncond + g*(cond-uncond)` becomes one small
            psum of coefficient-weighted branch outputs per step.
  sp (4):   spatial blocks along the latent W axis (128→64→32→16 divides by
            4 at every UNet level, unlike H's 72→36→18→9). Convs exchange
            1-column halos, GroupNorm psums its stats, spatial self-attention
            all-gathers K/V; temporal ops are local per pixel. See
            parallel/spmd.py for the op-level contract.

The same body degenerates exactly on smaller meshes: cfg=1 computes both CFG
branches locally (the coefficient sum runs over the local batch), sp=1 makes
every halo/psum/gather a no-op — so a (1,1) mesh runs the identical code path
on a single chip (used to validate Pallas-kernels-under-shard_map on real
hardware, where only one chip is attached).

Decode shards frame-CHUNKS over all mesh devices: the reference's chunked VAE
decode (pipeline_stable_video_diffusion_controlnet.py:225-251) already treats
each chunk as temporally independent, so chunks distribute with zero
communication. Encode (one CLIP pass + one VAE image encode) is replicated —
it is ~0.3 s of an ~37 s single-chip budget and not worth sharding yet.

Reference equivalent: none (the reference serves one video on one GPU with
CPU offload, run_inference_vipseg_json_repro.py:339). This layout is the
build's own design, PERF.md roadmap #4 / VERDICT round-2 next #1.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from posetraj_tpu.diffusion.euler_karras import euler_step
from posetraj_tpu.models import controlnet as cn
from posetraj_tpu.models import unet as unet_m
from posetraj_tpu.models import vae as vae_m
from posetraj_tpu.parallel import spmd
from posetraj_tpu.pipeline.svd_controlnet import (
    ModelBundle,
    PipelineConfig,
    encode_image_clip,
    encode_image_vae,
)


def make_serve_mesh(n_cfg: int = 2, n_sp: int = 4, devices=None) -> Mesh:
    """("cfg", "sp") mesh for single-video serving. v5e-8: (2, 4)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size == n_cfg * n_sp, (devices.size, n_cfg, n_sp)
    return Mesh(devices.reshape(n_cfg, n_sp), ("cfg", "sp"))


def _check_divisible(
    pcfg: PipelineConfig, bundle: ModelBundle, num_frames: int, mesh: Mesh
) -> tuple:
    """Validate the mesh against the resolution ladder and compute the
    replicated-deep-level boundary.

    Returns (replicated_h, replicated_s) frozensets for SpmdCtx: UNet levels
    whose W ladder stops dividing over sp run REPLICATED — the downsampler
    into the first such level all-gathers W, the matching upsampler
    re-scatters (ops/primitives.py). This is what lets the reference eval
    resolution 320x576 (latent W 72 -> 36 -> 18 -> 9; the deepest level's 9
    cannot split — run_inference_vipseg_json_repro.py:451) serve on a
    (cfg=2, sp=2) 4-chip mesh: levels 0-2 shard, the 5x9 deepest level
    (~0.3% of the step FLOPs) replicates. Level 0 itself failing to divide is
    still an error — there is no useful sp layout then.
    """
    n_sp = mesh.shape["sp"]
    n_cfg = mesh.shape["cfg"]
    if n_cfg not in (1, 2):
        raise ValueError(f"cfg axis must be 1 or 2 (CFG pair), got {n_cfg}")
    if num_frames % pcfg.decode_chunk_size != 0:
        raise ValueError(
            "sharded decode requires decode_chunk_size | num_frames "
            f"({pcfg.decode_chunk_size} vs {num_frames}) so chunk boundaries "
            "match the unsharded chunked decode exactly"
        )
    if n_sp == 1:
        return frozenset(), frozenset()
    sf = bundle.vae.scale_factor
    w_lat = pcfg.width // sf
    h_lat = pcfg.height // sf
    n_levels = bundle.unet.num_levels
    if w_lat % n_sp != 0:
        raise ValueError(
            f"latent width {w_lat} does not divide over sp={n_sp}; choose a "
            f"width whose latent is a multiple of {n_sp}"
        )
    # Hint-encoder pixel ladder: log2(sf) stride-2 convs from pixel width down
    # to the latent width, each needing an even local shard.
    sharded_h, sharded_s = set(), set()
    for i in range((sf - 1).bit_length()):
        w_px = pcfg.width >> i
        if (w_px // n_sp) % 2 != 0:
            raise ValueError(
                f"hint-encoder width {w_px} has an odd local shard under sp={n_sp}"
            )
        sharded_h.add(pcfg.height >> i)
    # Walk the UNet ladder: a level stays sharded until a downsample's local
    # width goes odd; everything deeper is replicated.
    replicated_h, replicated_s = set(), set()
    h, w, sharded = h_lat, w_lat, True
    for lvl in range(n_levels):
        if sharded:
            sharded_h.add(h)
            sharded_s.add(h * (w // n_sp))
        else:
            replicated_h.add(h)
            replicated_s.add(h * w)
        if lvl < n_levels - 1:
            if sharded and ((w // n_sp) % 2 != 0):
                sharded = False
            h, w = -(-h // 2), -(-w // 2)
    if replicated_h & sharded_h or replicated_s & sharded_s:
        # The trace-time shape keys (ops gate collectives on H / token count)
        # would be ambiguous; no known real config hits this.
        raise ValueError(
            f"ambiguous ladder: replicated levels (H {sorted(replicated_h)}, "
            f"S {sorted(replicated_s)}) collide with sharded extents under "
            f"sp={n_sp} at {pcfg.height}x{pcfg.width}"
        )
    return frozenset(replicated_h), frozenset(replicated_s)


@partial(
    jax.jit,
    static_argnames=("bundle", "pcfg", "num_frames", "mesh", "output_latent"),
)
def _generate_sharded_jit(
    params: Dict,
    bundle: ModelBundle,
    pcfg: PipelineConfig,
    image: jax.Array,
    control_video: jax.Array,
    noises: Dict[str, jax.Array],
    added_time_ids: jax.Array,
    sigmas: jax.Array,
    timesteps: jax.Array,
    num_frames: int,
    mesh: Mesh,
    camera_cond: Optional[jax.Array] = None,
    bbox_cond: Optional[jax.Array] = None,
    rot_id: Optional[jax.Array] = None,
    output_latent: bool = False,
) -> jax.Array:
    """Sharded twin of pipeline.generate for B=1 (one video).

    Same contract as pipeline/svd_controlnet.generate, plus `mesh` with axes
    ("cfg", "sp"). Numerics match the unsharded program up to reduction-order
    float differences (GroupNorm psum, gathered-KV softmax).
    """
    from posetraj_tpu.configs import use_kernels

    with use_kernels(bundle.kernels):
        return _generate_sharded_impl(
            params, bundle, pcfg, image, control_video, noises,
            added_time_ids, sigmas, timesteps, num_frames, mesh,
            camera_cond, bbox_cond, rot_id, output_latent,
        )


def generate_sharded(params: Dict, bundle: ModelBundle, *args, **kwargs) -> jax.Array:
    """Public entry: `_generate_sharded_jit` with kernel toggles resolved into
    the static bundle (pipeline.resolve_kernels — a toggle flip is a retrace,
    never a stale executable)."""
    from posetraj_tpu.pipeline.svd_controlnet import resolve_kernels

    return _generate_sharded_jit(params, resolve_kernels(bundle), *args, **kwargs)


def _lower_generate_sharded(params, bundle, *a, **k):
    from posetraj_tpu.pipeline.svd_controlnet import resolve_kernels

    return _generate_sharded_jit.lower(params, resolve_kernels(bundle), *a, **k)


generate_sharded.lower = _lower_generate_sharded
generate_sharded.__wrapped_jit__ = _generate_sharded_jit  # tests: retrace observability


def _generate_sharded_impl(
    params, bundle, pcfg, image, control_video, noises, added_time_ids,
    sigmas, timesteps, num_frames, mesh,
    camera_cond, bbox_cond, rot_id, output_latent,
):
    assert image.shape[0] == 1, "single-video serving path requires batch 1"
    replicated_h, replicated_s = _check_divisible(pcfg, bundle, num_frames, mesh)
    n_cfg = mesh.shape["cfg"]
    n_sp = mesh.shape["sp"]
    compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    ctx = spmd.SpmdCtx(sp_axis="sp", sp_size=n_sp, cfg_axis="cfg", cfg_size=n_cfg,
                       replicated_h=replicated_h, replicated_s=replicated_s)

    # ---- encode (replicated on every chip; ~0.3 s of the budget) ----------
    def _encode_body(params_, image_, aug_noise_):
        clip_emb = encode_image_clip(params_, bundle, image_, compute_dtype)
        img_lat = encode_image_vae(
            params_, bundle, image_ * 2.0 - 1.0, aug_noise_, pcfg.noise_aug_strength
        )
        return clip_emb, img_lat

    clip_emb, image_latents = jax.shard_map(
        _encode_body, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(), check_vma=False
    )(params, image, noises["image_aug"])

    from posetraj_tpu.pipeline.svd_controlnet import _init_noise_sigma

    latents0 = noises["latents"].astype(jnp.float32) * _init_noise_sigma(bundle, sigmas)
    control = (control_video * 2.0 - 1.0).astype(compute_dtype)
    control = jnp.concatenate([control, control], axis=0)  # CFG x2
    guidance = jnp.linspace(pcfg.min_guidance_scale, pcfg.max_guidance_scale, num_frames)
    time_ids = jnp.concatenate([added_time_ids, added_time_ids], axis=0)
    cfg2 = lambda x: None if x is None else jnp.concatenate([x, x], axis=0)
    camera_cond = cfg2(camera_cond)
    if bbox_cond is not None:
        bbox_cond = cfg2(bbox_cond * 2.0 - 1.0).astype(compute_dtype)
    rot_id = cfg2(rot_id)

    # ---- denoise: shard_map over (cfg, sp) --------------------------------
    u = bundle.unet
    c = bundle.controlnet

    def _denoise_body(params_, lat0, img_lat, clip_, ctrl, tids, sig, ts, guid,
                      cam, bbox, rid):
        # local shapes: lat0 (1, F, h, w/n_sp, 4); img_lat (2/n_cfg, h, w/n_sp, 4);
        # clip_ (2/n_cfg, 1, D); ctrl (2/n_cfg, F, H, W/n_sp, 3); tids (2/n_cfg, 3).
        b_loc = img_lat.shape[0]
        f = num_frames
        img5 = jnp.repeat(img_lat[:, None], f, axis=1).astype(compute_dtype)
        gs = guid.reshape(1, f, 1, 1, 1).astype(jnp.float32)
        # Global CFG branch ids of the local batch rows: 0 = uncond, 1 = cond.
        ids = lax.axis_index("cfg") * b_loc + jnp.arange(b_loc)
        coeff = jnp.where(ids.reshape(-1, 1, 1, 1, 1) == 0, 1.0 - gs, gs)  # (b_loc,F,1,1,1)

        with spmd.spatial_sharding(ctx):
            hint = cn.hint_encoder(
                params_["controlnet"]["controlnet_cond_embedding"], c.hint,
                ctrl.astype(compute_dtype), f,
                camera_cond=cam, bbox_cond=bbox, rot_id=rid,
                compute_dtype=compute_dtype,
            )

            def body(carry, step):
                lat = carry  # (1, F, h, w_loc, 4) fp32, identical on every chip row
                sigma, sigma_next, t = step
                lat_in = jnp.broadcast_to(lat, (b_loc, *lat.shape[1:]))
                lat_in = (lat_in / jnp.sqrt(sigma**2 + 1.0)).astype(compute_dtype)
                lat_in = jnp.concatenate([lat_in, img5], axis=-1)

                down_res, mid_res = cn.controlnet_forward(
                    params_["controlnet"], c, lat_in, t, clip_, tids,
                    conditioning_scale=pcfg.controlnet_cond_scale,
                    hint_embedding=hint, compute_dtype=compute_dtype,
                )
                pred = unet_m.unet_forward(
                    params_["unet"], u, lat_in, t, clip_, tids,
                    down_res, mid_res, compute_dtype=compute_dtype,
                ).astype(jnp.float32)

                # CFG combine across chips: sum_b coeff_b * pred_b over the
                # global branch set == uncond + g*(cond - uncond).
                noise_pred = lax.psum(
                    jnp.sum(coeff * pred, axis=0, keepdims=True), "cfg"
                )
                new_lat, _ = euler_step(
                    noise_pred, lat, sigma, sigma_next, bundle.scheduler.prediction_type
                )
                return new_lat.astype(jnp.float32), None

            steps = (sig[:-1], sig[1:], ts)
            final, _ = jax.lax.scan(body, lat0.astype(jnp.float32), steps)
        return final

    sp_spec5 = P(None, None, None, "sp", None)  # (B/1, F, h, W, C)
    latents = jax.shard_map(
        _denoise_body,
        mesh=mesh,
        in_specs=(
            P(),                                 # params replicated
            sp_spec5,                            # latents
            P("cfg", None, "sp", None),          # image_latents (2, h, w, 4)
            P("cfg"),                            # clip (2, 1, D)
            P("cfg", None, None, "sp", None),    # control (2, F, H, W, 3)
            P("cfg"),                            # time_ids (2, 3)
            P(), P(), P(),                       # sigmas, timesteps, guidance
            P("cfg") if camera_cond is not None else P(),
            P("cfg", None, None, "sp", None) if bbox_cond is not None else P(),
            P("cfg") if rot_id is not None else P(),
        ),
        out_specs=sp_spec5,
        check_vma=False,
    )(params, latents0, image_latents, clip_emb, control, time_ids,
      sigmas, timesteps, guidance, camera_cond, bbox_cond, rot_id)

    if output_latent:
        return latents

    # ---- decode: frame chunks over all 8 devices --------------------------
    # Denoise leaves latents W-sharded over "sp"; decode distributes frame
    # chunks over ALL devices — a genuine redistribution. The tensor is tiny
    # (~2 MB fp32 at 576x1024/14f), so one explicit ICI all-gather is the
    # right move; leaving the reshard implicit makes the SPMD partitioner
    # rematerialize the reshape chain with a full all-gather anyway, plus an
    # "involuntary full rematerialization" warning (MULTICHIP_r03 tail).
    latents = jax.lax.with_sharding_constraint(
        latents, jax.sharding.NamedSharding(mesh, P())
    )
    frames = _decode_sharded(params, bundle, latents, pcfg.decode_chunk_size,
                             mesh, compute_dtype)
    return jnp.clip(frames / 2.0 + 0.5, 0.0, 1.0)


def _decode_sharded(params, bundle, latents, chunk, mesh, compute_dtype):
    """(1, F, h, w, 4) -> (1, F, H, W, 3): the chunked VAE decode with chunks
    distributed over every mesh device (chunks are temporally independent by
    the reference's own decode_chunk_size semantics, so zero communication)."""
    n_dev = mesh.devices.size
    b, f = latents.shape[:2]
    flat = latents.reshape(b * f, *latents.shape[2:]) / bundle.vae.scaling_factor
    n_chunks = (b * f) // chunk
    n_pad = -(-n_chunks // n_dev) * n_dev
    stacked = flat.reshape(n_chunks, chunk, *flat.shape[1:])
    if n_pad != n_chunks:
        stacked = jnp.pad(stacked, ((0, n_pad - n_chunks),) + ((0, 0),) * (stacked.ndim - 1))

    def _decode_body(params_, chunks):  # chunks: (n_pad/n_dev, chunk, h, w, 4)
        decode_one = lambda ch: vae_m.decode(
            params_["vae"]["decoder"], bundle.vae, ch, chunk, compute_dtype
        )
        if chunks.shape[0] == 1:
            return decode_one(chunks[0])[None]
        return jax.lax.map(decode_one, chunks)

    frames = jax.shard_map(
        _decode_body,
        mesh=mesh,
        in_specs=(P(), P(("cfg", "sp"))),
        out_specs=P(("cfg", "sp")),
        check_vma=False,
    )(params, stacked)
    frames = frames.reshape(n_pad * chunk, *frames.shape[2:])[: b * f].astype(jnp.float32)
    return frames.reshape(b, f, *frames.shape[1:])
