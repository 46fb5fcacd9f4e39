"""End-to-end trajectory-conditioned img2vid sampling pipeline.

TPU-native rebuild of StableVideoDiffusionPipelineControlNet
(pipeline_stable_video_diffusion_controlnet.py:316-599) and its camera twin
(pipeline_stable_video_diffusion_controlnet_cam.py): the 25-step denoise loop
is a `lax.scan` over the static sigma ladder (no per-step host sync — the
reference's stateful `_step_index` search becomes the scan counter), CFG is a
leading batch-2 axis, and the whole image->video path jit-compiles into one
XLA program per (shape, config).

Fidelity quirks preserved (flags in PipelineConfig / here):
  Q2 per-frame guidance linspace(min->max, num_frames) broadcast over latent
     dims (:506-511).
  Q3 added_time_ids recomputed with hard-coded (fps=6, motion=128, aug=0.02),
     discarding user args (:513-523); order [fps, motion, aug] at inference.
  Q8 `_encode_image` feeds the antialias-resized [0,1] image STRAIGHT to CLIP
     — no CLIP mean/std normalization at inference (:145-156), unlike training
     (train_svd_traj_blender_14.py:1105-1124). `fidelity_clip_unnormalized`
     reproduces it.

Parity hook: all Gaussian draws can be injected via `noises=` so
reference-generated torch noise can be fed in for golden-latent tests
(SURVEY.md section 7 hard part (a)).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from posetraj_tpu.configs import (
    CLIPVisionConfig,
    ControlNetConfig,
    KernelConfig,
    PipelineConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
    use_kernels,
)
from posetraj_tpu.diffusion.euler_karras import euler_step, make_schedule
from posetraj_tpu.models import clip as clip_m
from posetraj_tpu.models import controlnet as cn
from posetraj_tpu.models import unet as unet_m
from posetraj_tpu.models import vae as vae_m
from posetraj_tpu.ops.resize import resize_antialias


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """Static model configs for one pipeline instance (hashable => jit-static)."""

    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    controlnet: ControlNetConfig = dataclasses.field(default_factory=ControlNetConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    clip: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    fidelity_clip_unnormalized: bool = True  # Q8
    # Pallas dispatch toggles for every trace made under this bundle;
    # None = env-seeded defaults (configs.KernelConfig.from_env).
    kernels: Optional[KernelConfig] = None

    @classmethod
    def tiny(cls, variant: str = "base") -> "ModelBundle":
        return cls(
            unet=UNetConfig.tiny(),
            controlnet=ControlNetConfig.tiny(variant),
            vae=VAEConfig.tiny(),
            clip=CLIPVisionConfig.tiny(),
        )

    @classmethod
    def with_variant(cls, variant: str = "base") -> "ModelBundle":
        """Flagship configs with a non-base hint-encoder variant (bbox/cam/
        rot/entity/temp — SURVEY.md 2.3-2.8)."""
        from posetraj_tpu.configs import HintEncoderConfig

        return cls(controlnet=ControlNetConfig(hint=HintEncoderConfig(variant=variant)))


def encode_image_clip(
    params: Dict,
    bundle: ModelBundle,
    image: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """[0,1] RGB (B, H, W, 3) -> CFG-stacked CLIP embeddings (2B, 1, D):
    zeros (uncond) first, then cond (pipeline...controlnet.py:145-172)."""
    resized = resize_antialias(image.astype(jnp.float32), (bundle.clip.image_size, bundle.clip.image_size))
    if not bundle.fidelity_clip_unnormalized:
        resized = clip_m.clip_preprocess(resized, bundle.clip)
    emb = clip_m.clip_image_embeds(params["clip"], bundle.clip, resized, compute_dtype)
    emb = emb[:, None, :].astype(compute_dtype)  # (B, 1, D)
    return jnp.concatenate([jnp.zeros_like(emb), emb], axis=0)


def encode_image_vae(
    params: Dict,
    bundle: ModelBundle,
    image: jax.Array,
    noise: jax.Array,
    noise_aug_strength: float,
) -> jax.Array:
    """[-1,1] image (B, H, W, 3) + noise-aug -> CFG-stacked cond latents
    (2B, h, w, 4): zeros first, then .mode() latents. fp32 VAE encode
    (pipeline...controlnet.py:449-466). NOT divided by scaling_factor — the
    reference concatenates raw `.mode()` output."""
    image = image + noise_aug_strength * noise
    mean, _ = vae_m.encode(params["vae"]["encoder"], bundle.vae, image, compute_dtype=jnp.float32)
    return jnp.concatenate([jnp.zeros_like(mean), mean], axis=0)


def _init_noise_sigma(bundle: ModelBundle, sigmas: jax.Array) -> jax.Array:
    """Initial-latent scale (scheduling_euler_discrete_karras_fix.py:248-255):
    max sigma for linspace/trailing spacing, sqrt(sigma_max^2+1) otherwise —
    the checkpoint's "leading" spacing takes the sqrt branch."""
    if bundle.scheduler.timestep_spacing in ("linspace", "trailing"):
        return sigmas[0]
    return jnp.sqrt(sigmas[0] ** 2 + 1.0)


def added_time_ids_inference(pcfg: PipelineConfig) -> np.ndarray:
    """(1, 3) in the INFERENCE order [fps, motion_bucket, noise_aug].

    Q3: fidelity mode hard-codes (6, 128, 0.02) regardless of user args
    (pipeline...controlnet.py:513-523); clean mode honors them (with the
    fps-1 conditioning offset, :446)."""
    if pcfg.fidelity_time_ids_override:
        return np.asarray([[6.0, 128.0, 0.02]], np.float32)
    return np.asarray([[pcfg.fps - 1, pcfg.motion_bucket_id, pcfg.noise_aug_strength]], np.float32)


def denoise_scan(
    params: Dict,
    bundle: ModelBundle,
    pcfg: PipelineConfig,
    latents: jax.Array,
    image_latents: jax.Array,
    clip_embeddings: jax.Array,
    control_video: jax.Array,
    added_time_ids: jax.Array,
    sigmas: jax.Array,
    timesteps: jax.Array,
    guidance_scale: jax.Array,
    camera_cond: Optional[jax.Array] = None,
    bbox_cond: Optional[jax.Array] = None,
    rot_id: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """The hot loop (pipeline...controlnet.py:529-583) as one lax.scan.

    latents: (B, F, h, w, 4) fp32. image_latents: (2B, h, w, 4). control_video:
    (2B, F, H, W, 3) in [-1,1]. guidance_scale: (F,) per-frame (Q2).
    """
    b = latents.shape[0]
    f = latents.shape[1]
    img_lat = jnp.repeat(image_latents[:, None], f, axis=1).astype(compute_dtype)  # (2B, F, h, w, 4)
    u = bundle.unet
    c = bundle.controlnet
    gs = guidance_scale.reshape(1, f, 1, 1, 1).astype(jnp.float32)

    # The hint embedding depends only on the control video — compute ONCE and
    # reuse across every denoise step (the reference reruns the conv stack
    # inside the loop, pipeline...controlnet.py:538-547).
    hint = cn.hint_encoder(
        params["controlnet"]["controlnet_cond_embedding"], c.hint,
        control_video.astype(compute_dtype), f,
        camera_cond=camera_cond, bbox_cond=bbox_cond, rot_id=rot_id,
        compute_dtype=compute_dtype,
    )

    def body(carry, step):
        lat = carry  # (B, F, h, w, 4) fp32
        sigma, sigma_next, t = step
        lat_in = jnp.concatenate([lat, lat], axis=0)
        lat_in = (lat_in / jnp.sqrt(sigma**2 + 1.0)).astype(compute_dtype)
        lat_in = jnp.concatenate([lat_in, img_lat], axis=-1)  # channel concat (:537)

        down_res, mid_res = cn.controlnet_forward(
            params["controlnet"], c, lat_in, t, clip_embeddings, added_time_ids,
            conditioning_scale=pcfg.controlnet_cond_scale,
            hint_embedding=hint,
            compute_dtype=compute_dtype,
        )
        noise_pred = unet_m.unet_forward(
            params["unet"], u, lat_in, t, clip_embeddings, added_time_ids,
            down_res, mid_res, compute_dtype=compute_dtype,
        ).astype(jnp.float32)

        uncond, cond = noise_pred[:b], noise_pred[b:]
        noise_pred = uncond + gs * (cond - uncond)
        new_lat, _ = euler_step(noise_pred, lat, sigma, sigma_next, bundle.scheduler.prediction_type)
        return new_lat.astype(jnp.float32), None

    steps = (sigmas[:-1], sigmas[1:], timesteps)
    final, _ = jax.lax.scan(body, latents.astype(jnp.float32), steps)
    return final


def decode_latents(
    params: Dict,
    bundle: ModelBundle,
    latents: jax.Array,
    decode_chunk_size: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """(B, F, h, w, 4) -> (B, F, H, W, 3) fp32 in [-1,1]; chunked frame decode
    (pipeline...controlnet.py:225-251).

    When the chunk size divides B*F the chunks run under `lax.map` — one
    compiled decoder body executed sequentially, so peak HBM is a single
    chunk's activations regardless of frame count (the decode_chunk_size knob
    is the reference's own memory lever; at 576x1024 on a 16G chip small
    chunks are what make full-res decode fit). Ragged tails fall back to a
    static Python loop (at most 2 distinct chunk graphs)."""
    b, f = latents.shape[:2]
    flat = latents.reshape(b * f, *latents.shape[2:]) / bundle.vae.scaling_factor
    if (b * f) % decode_chunk_size == 0 and (b * f) // decode_chunk_size > 1:
        stacked = flat.reshape(-1, decode_chunk_size, *flat.shape[1:])
        frames = jax.lax.map(
            lambda chunk: vae_m.decode(
                params["vae"]["decoder"], bundle.vae, chunk, decode_chunk_size, compute_dtype
            ),
            stacked,
        )
        frames = frames.reshape(b * f, *frames.shape[2:]).astype(jnp.float32)
    else:
        outs = []
        for i in range(0, b * f, decode_chunk_size):
            chunk = flat[i : i + decode_chunk_size]
            outs.append(vae_m.decode(params["vae"]["decoder"], bundle.vae, chunk, chunk.shape[0], compute_dtype))
        frames = jnp.concatenate(outs, axis=0).astype(jnp.float32)
    return frames.reshape(b, f, *frames.shape[1:])


def resolve_kernels(bundle: "ModelBundle") -> "ModelBundle":
    """Pin the active KernelConfig into the (hashable, jit-static) bundle.

    VERDICT r4 weak #7: dispatch gates run at TRACE time, so with
    bundle.kernels=None an env-var flip between two calls of an
    already-compiled program silently reused the stale executable. Every
    library-owned jit boundary (generate / generate_sharded / the Trainer
    step) now resolves None -> KernelConfig.from_env() BEFORE the jit call,
    making the toggle set part of the cache key: a flip is a retrace, never
    a stale hit. Explicit bundle.kernels passes through untouched."""
    if bundle.kernels is None:
        return dataclasses.replace(bundle, kernels=KernelConfig.from_env())
    return bundle


@partial(jax.jit, static_argnames=("bundle", "pcfg", "num_frames", "output_latent"))
def _generate_jit(
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
    camera_cond: Optional[jax.Array] = None,
    bbox_cond: Optional[jax.Array] = None,
    rot_id: Optional[jax.Array] = None,
    output_latent: bool = False,
) -> jax.Array:
    """Full image -> video program.

    image: (B, H, W, 3) in [0,1]. control_video: (B, F, H, W, 3) in [0,1]
    (rasterized trajectory maps). noises: dict with keys
      "latents"   (B, F, h, w, 4) standard normal
      "image_aug" (B, H, W, 3)    standard normal
    (injectable for parity tests). Returns (B, F, H, W, 3) fp32 [0,1], or raw
    latents if output_latent.
    """
    with use_kernels(bundle.kernels):
        return _generate_impl(
            params, bundle, pcfg, image, control_video, noises, added_time_ids,
            sigmas, timesteps, num_frames, camera_cond, bbox_cond, rot_id,
            output_latent,
        )


def generate(params: Dict, bundle: ModelBundle, *args, **kwargs) -> jax.Array:
    """Public entry: `_generate_jit` with the kernel toggles resolved into the
    static bundle (see resolve_kernels). Same signature as `_generate_jit`."""
    return _generate_jit(params, resolve_kernels(bundle), *args, **kwargs)


generate.lower = lambda params, bundle, *a, **k: _generate_jit.lower(
    params, resolve_kernels(bundle), *a, **k
)
generate.__wrapped_jit__ = _generate_jit  # tests: retrace observability


def _generate_impl(
    params, bundle, pcfg, image, control_video, noises, added_time_ids,
    sigmas, timesteps, num_frames, camera_cond, bbox_cond, rot_id,
    output_latent,
):
    compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    clip_emb = encode_image_clip(params, bundle, image, compute_dtype)

    image_m11 = image * 2.0 - 1.0  # VaeImageProcessor.preprocess normalize (:449)
    image_latents = encode_image_vae(params, bundle, image_m11, noises["image_aug"], pcfg.noise_aug_strength)

    latents = noises["latents"].astype(jnp.float32) * _init_noise_sigma(bundle, sigmas)

    control = (control_video * 2.0 - 1.0).astype(compute_dtype)
    control = jnp.concatenate([control, control], axis=0)  # CFG x2 (:502)

    guidance = jnp.linspace(pcfg.min_guidance_scale, pcfg.max_guidance_scale, num_frames)

    time_ids = jnp.concatenate([added_time_ids, added_time_ids], axis=0)  # CFG x2 (:522)
    cfg2 = lambda x: None if x is None else jnp.concatenate([x, x], axis=0)
    camera_cond = cfg2(camera_cond)
    if bbox_cond is not None:
        bbox_cond = cfg2(bbox_cond * 2.0 - 1.0).astype(compute_dtype)
    rot_id = cfg2(rot_id)

    latents = denoise_scan(
        params, bundle, pcfg, latents, image_latents, clip_emb, control,
        time_ids, sigmas, timesteps, guidance, camera_cond, bbox_cond, rot_id,
        compute_dtype,
    )
    if output_latent:
        return latents
    # Decode in the session compute dtype (bf16 on TPU) — the reference's VAE
    # is fp16 at decode time (only *encode* gets the fp32 upcast,
    # pipeline...controlnet.py:453-462); fp32 decode at 576x1024 also
    # quadruples the decoder's activation footprint past HBM.
    frames = decode_latents(params, bundle, latents, pcfg.decode_chunk_size, compute_dtype)
    return jnp.clip(frames / 2.0 + 0.5, 0.0, 1.0)  # postprocess to [0,1]


class SVDControlNetPipeline:
    """User-facing wrapper mirroring the reference __call__ surface
    (pipeline...controlnet.py:316-340) over the jitted `generate` program.

    params: {"unet": ..., "controlnet": ..., "vae": {"encoder","decoder"},
    "clip": ...}. Accepts numpy/PIL inputs on the host; all device work is one
    compiled program per (resolution, frames, steps) signature.
    """

    def __init__(self, params: Dict, bundle: ModelBundle = ModelBundle(), mesh=None,
                 serve_mesh=None):
        """mesh: optional jax.sharding.Mesh for pod-scale batched serving —
        inputs shard their batch axis over "data" and the big transformer
        weights tensor-shard over "model" (parallel/mesh.py); XLA propagates
        shardings through the whole compiled program (BASELINE configs[4]).

        serve_mesh: optional ("cfg", "sp") mesh for SINGLE-video sharded
        serving (parallel/serve.py) — the v5e-8 north-star path. Used for
        batch-1 calls; mutually exclusive with `mesh`."""
        self.params = params
        self.bundle = bundle
        self.mesh = mesh
        self.serve_mesh = serve_mesh
        assert not (mesh is not None and serve_mesh is not None), (
            "mesh (batched) and serve_mesh (single-video) are mutually exclusive"
        )
        if mesh is not None:
            from posetraj_tpu.parallel.mesh import param_shardings, shard_params

            self.params = shard_params(params, param_shardings(params, mesh))

    def _shard_batch(self, tree):
        if self.mesh is None:
            return tree
        from posetraj_tpu.parallel.mesh import batch_sharding

        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sharding(self.mesh, jnp.asarray(x).ndim)), tree
        )

    def __call__(
        self,
        image,
        controlnet_condition,
        height: int = 576,
        width: int = 1024,
        num_frames: int = 14,
        num_inference_steps: int = 25,
        min_guidance_scale: float = 1.0,
        max_guidance_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        controlnet_cond_scale: float = 1.0,
        decode_chunk_size: Optional[int] = None,
        camera_cond=None,
        bbox_condition=None,
        rot_id=None,
        seed: int = 0,
        noises: Optional[Dict[str, jax.Array]] = None,
        output_type: str = "np",
    ):
        pcfg = PipelineConfig(
            height=height,
            width=width,
            num_frames=num_frames,
            num_inference_steps=num_inference_steps,
            min_guidance_scale=min_guidance_scale,
            max_guidance_scale=max_guidance_scale,
            fps=fps,
            motion_bucket_id=motion_bucket_id,
            noise_aug_strength=noise_aug_strength,
            controlnet_cond_scale=controlnet_cond_scale,
            decode_chunk_size=decode_chunk_size or num_frames,
        )
        image = _to_float_array(image)  # (B, H, W, 3) [0,1]
        control = _to_float_array(controlnet_condition)
        if control.ndim == 4:  # (F, H, W, 3) -> (1, F, H, W, 3)
            control = control[None]
        b = image.shape[0]
        sf = self.bundle.vae.scale_factor
        lat_shape = (b, num_frames, height // sf, width // sf, self.bundle.vae.latent_channels)

        if noises is None:
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            noises = {
                "latents": jax.random.normal(k1, lat_shape, jnp.float32),
                "image_aug": jax.random.normal(k2, image.shape, jnp.float32),
            }

        sched = make_schedule(self.bundle.scheduler, num_inference_steps)
        time_ids = np.tile(added_time_ids_inference(pcfg), (b, 1))  # per-video rows
        if self.serve_mesh is not None and b == 1:
            from posetraj_tpu.parallel.serve import generate_sharded

            frames = generate_sharded(
                self.params, self.bundle, pcfg,
                jnp.asarray(image), jnp.asarray(control), noises,
                jnp.asarray(time_ids), jnp.asarray(sched.sigmas),
                jnp.asarray(sched.timesteps), num_frames, self.serve_mesh,
                camera_cond=None if camera_cond is None else jnp.asarray(camera_cond),
                bbox_cond=None if bbox_condition is None else jnp.asarray(_to_float_array(bbox_condition)),
                rot_id=None if rot_id is None else jnp.asarray(rot_id),
                output_latent=(output_type == "latent"),
            )
            return self._postprocess(frames, output_type)
        image, control, noises = self._shard_batch((jnp.asarray(image), jnp.asarray(control), noises))
        frames = generate(
            self.params,
            self.bundle,
            pcfg,
            image,
            control,
            noises,
            jnp.asarray(time_ids),
            jnp.asarray(sched.sigmas),
            jnp.asarray(sched.timesteps),
            num_frames,
            camera_cond=None if camera_cond is None else jnp.asarray(camera_cond),
            bbox_cond=None if bbox_condition is None else jnp.asarray(_to_float_array(bbox_condition)),
            rot_id=None if rot_id is None else jnp.asarray(rot_id),
            output_latent=(output_type == "latent"),
        )
        return self._postprocess(frames, output_type)

    @staticmethod
    def _postprocess(frames, output_type: str):
        out = np.asarray(frames)
        if output_type in ("latent", "np"):
            return out
        if output_type == "pil":
            from PIL import Image

            return [
                [Image.fromarray((fr * 255).round().astype(np.uint8)) for fr in vid] for vid in out
            ]
        return out


def _to_float_array(x) -> np.ndarray:
    """PIL image / list of PIL / numpy -> float32 [0,1] channels-last with batch dim."""
    try:
        from PIL import Image

        if isinstance(x, Image.Image):
            x = np.asarray(x, np.float32)[None] / 255.0
        elif isinstance(x, (list, tuple)) and x and isinstance(x[0], Image.Image):
            x = np.stack([np.asarray(im, np.float32) for im in x]) / 255.0
    except ImportError:
        pass
    x = np.asarray(x, np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    if x.ndim == 3:
        x = x[None]
    return x
