"""Trajectory ControlNet: UNet-encoder copy + hint encoder + zero-conv heads.

Rebuild of models/controlnet_sdv.py:201-709. The reference forks an ~880-line
model file per hint-encoder variant (bbox / cam / rot-id / entity / temporal);
here every variant is a config switch on one pluggable hint encoder
(HintEncoderConfig.variant), sharing the encoder trunk.

Variant provenance:
  base   controlnet_sdv.py:61-116 (conv_in -> 3x [conv, stride-2 conv] -> zero conv_out)
  bbox   controlnet_sdv_bbox.py:95-136 (second branch for rendered-3D-bbox maps,
         embeddings summed). The reference routes branch 2 through branch 1's
         conv_out (a latent bug, :128); we use the variant's own conv_out_2 and
         expose `fidelity_shared_conv_out` to reproduce the reference wiring.
  cam    controlnet_sdv_cam.py:61-121 (RT(12) broadcast over HxW, channel concat,
         linear cc_projection back to C_embed; identity/zero init per
         train_svd_traj_VIPSeg_14_cam_concat.py:998-1012). Built in the
         corrected general form Linear(C_embed+12, C_embed) (quirk Q6).
  rot    controlnet_sdv_v2.py:95-113 (nn.Embedding(2, C) added per sample)
  entity controlnet_sdv_entity.py:95-123 (zero-conv'd entity map, broadcast over frames)
  temp   controlnet_sdv_temp.py:62-165 (temporal transformer over the 14 frames
         after the conv stack)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from posetraj_tpu.configs import ControlNetConfig, HintEncoderConfig
from posetraj_tpu.core.init import (
    conv_init,
    embedding_init,
    identity_pad_linear_init,
    norm_init,
    rsplit,
    zero_conv_init,
)
from posetraj_tpu.models.blocks import down_block, init_down_block, init_mid_block, mid_block
from posetraj_tpu.models.embeddings import init_timestep_embedding
from posetraj_tpu.models.transformer import (
    init_basic_transformer_block,
    basic_transformer_block,
)
from posetraj_tpu.models.unet import compute_embeddings
from posetraj_tpu.ops.primitives import conv2d, group_norm, linear, silu


# ---------------------------------------------------------------------------
# Hint encoder
# ---------------------------------------------------------------------------


def _init_conv_stack(key: jax.Array, cfg: HintEncoderConfig) -> dict:
    """conv_in + interleaved [3x3 conv, 3x3 stride-2 conv] + zero conv_out
    (controlnet_sdv.py:81-93) — downsamples HxW by 8 to latent resolution."""
    boc = cfg.block_out_channels
    ks = rsplit(key, 2 * len(boc))
    p = {
        "conv_in": conv_init(ks[0], (3, 3, cfg.conditioning_channels, boc[0])),
        "blocks": [],
    }
    for i in range(len(boc) - 1):
        p["blocks"].append(conv_init(ks[2 * i + 1], (3, 3, boc[i], boc[i])))
        p["blocks"].append(conv_init(ks[2 * i + 2], (3, 3, boc[i], boc[i + 1])))
    p["conv_out"] = zero_conv_init((3, 3, boc[-1], cfg.embedding_channels))
    return p


def _conv_stack(params: dict, cond: jax.Array, compute_dtype=None) -> jax.Array:
    """(N, H, W, 3) -> (N, H/8, W/8, C_embed); silu after every conv except the
    zero conv_out (controlnet_sdv.py:101-108)."""
    h = silu(conv2d(params["conv_in"], cond, compute_dtype=compute_dtype))
    for i, block in enumerate(params["blocks"]):
        stride = 2 if i % 2 == 1 else 1
        h = silu(conv2d(block, h, stride=stride, padding=((1, 1), (1, 1)), compute_dtype=compute_dtype))
    return conv2d(params["conv_out"], h, compute_dtype=compute_dtype)


def init_hint_encoder(key: jax.Array, cfg: HintEncoderConfig) -> dict:
    ks = rsplit(key, 4)
    p = {"stack": _init_conv_stack(ks[0], cfg)}
    if cfg.variant == "bbox":
        p["stack_2"] = _init_conv_stack(ks[1], cfg)
    elif cfg.variant == "cam":
        p["cc_projection"] = identity_pad_linear_init(
            cfg.embedding_channels + cfg.camera_dim, cfg.embedding_channels
        )
    elif cfg.variant == "rot":
        p["rot_embed"] = embedding_init(ks[1], cfg.num_rot_classes, cfg.embedding_channels)
    elif cfg.variant == "entity":
        # Two zero 3x3 convs at embedding channels/latent res, no activation
        # (controlnet_sdv_entity.py:95-103).
        c = cfg.embedding_channels
        p["entity_in"] = zero_conv_init((3, 3, c, c))
        p["entity_out"] = zero_conv_init((3, 3, c, c))
    elif cfg.variant == "temp":
        from posetraj_tpu.core.init import linear_init

        c = cfg.embedding_channels
        tks = rsplit(ks[1], cfg.temp_num_layers + 2)
        p["temp"] = {
            "norm": norm_init(c),
            "proj_in": linear_init(tks[-2], c, c),
            "blocks": [
                init_basic_transformer_block(tks[i], c, cfg.temp_num_heads, None)
                for i in range(cfg.temp_num_layers)
            ],
            "proj_out": linear_init(tks[-1], c, c),
        }
    elif cfg.variant != "base":
        raise ValueError(f"unknown hint variant {cfg.variant}")
    return p


def hint_encoder(
    params: dict,
    cfg: HintEncoderConfig,
    cond: jax.Array,
    num_frames: int,
    bbox_cond: Optional[jax.Array] = None,
    camera_cond: Optional[jax.Array] = None,
    rot_id: Optional[jax.Array] = None,
    entity_cond: Optional[jax.Array] = None,
    fidelity_shared_conv_out: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """cond: (B, F, H, W, 3) control video -> (B*F, H/8, W/8, C_embed).

    Extra conditions per variant:
      bbox_cond   (B, F, H, W, 3) rendered 3D-bbox video
      camera_cond (B, F, 12) per-frame extrinsics RT
      rot_id      (B,) int32 in [0, num_rot_classes)
      entity_cond (1, h_lat, w_lat, C_embed) entity feature map, broadcast over batch*frames
    """
    b, f, hh, ww, c = cond.shape
    emb = _conv_stack(params["stack"], cond.reshape(b * f, hh, ww, c), compute_dtype)

    if cfg.variant == "bbox":
        if bbox_cond is None:
            raise ValueError("bbox variant requires bbox_cond")
        stack2 = dict(params["stack_2"])
        if fidelity_shared_conv_out:
            # Reference wiring: embedding_2 goes through branch 1's conv_out
            # (controlnet_sdv_bbox.py:128 / controlnet_sdv.py:191).
            stack2["conv_out"] = params["stack"]["conv_out"]
        emb2 = _conv_stack(stack2, bbox_cond.reshape(b * f, hh, ww, c), compute_dtype)
        emb = emb + emb2
    elif cfg.variant == "cam":
        if camera_cond is None:
            camera_cond = jnp.zeros((b, f, cfg.camera_dim), emb.dtype)
        cam = camera_cond.reshape(b * f, 1, 1, cfg.camera_dim).astype(emb.dtype)
        cam = jnp.broadcast_to(cam, (b * f, emb.shape[1], emb.shape[2], cfg.camera_dim))
        emb = linear(params["cc_projection"], jnp.concatenate([emb, cam], axis=-1), compute_dtype)
    elif cfg.variant == "rot":
        if rot_id is None:
            raise ValueError("rot variant requires rot_id")
        rot = params["rot_embed"]["embedding"][rot_id]  # (B, C)
        rot = jnp.repeat(rot, f, axis=0).astype(emb.dtype)  # (B*F, C)
        emb = emb + rot[:, None, None, :]
    elif cfg.variant == "entity":
        # entity feature at EMBEDDING channels + latent resolution, two zero
        # convs (no activation), broadcast over batch*frames and added
        # (controlnet_sdv_entity.py:119-123).
        if entity_cond is None:
            raise ValueError("entity variant requires entity_cond (B or 1, h_lat, w_lat, C_embed)")
        e = conv2d(params["entity_in"], entity_cond.astype(emb.dtype), compute_dtype=compute_dtype)
        e = conv2d(params["entity_out"], e, compute_dtype=compute_dtype)
        e = jnp.broadcast_to(e[:1], (b, *e.shape[1:]))  # reference repeats one feature map
        emb = emb + jnp.repeat(e, f, axis=0)
    elif cfg.variant == "temp":
        # Per-pixel temporal transformer over frames with a residual around it
        # (controlnet_sdv_temp.py:136-168). The GroupNorm normalizes per VIDEO
        # over (C/G, F, H, W) — the reference applies torch GN to the 5D
        # (B, C, F, H, W) tensor.
        n, eh, ew, ec = emb.shape
        residual = emb
        h5 = emb.reshape(b, f * eh * ew, ec)
        h5 = group_norm(params["temp"]["norm"], h5, eps=1e-6)
        h = h5.reshape(b, f, eh * ew, ec).transpose(0, 2, 1, 3).reshape(b * eh * ew, f, ec)
        h = linear(params["temp"]["proj_in"], h, compute_dtype)
        # Under W-sharded serving the token axis here is FRAMES (pixels sit in
        # the batch dim), so the transformer must not treat it as a shard of a
        # global spatial extent — suspend the spatial context. (The GroupNorm
        # above DOES span the sharded H*W extent and keeps it active.)
        from posetraj_tpu.parallel import spmd

        with spmd.local_tokens():
            for blk in params["temp"]["blocks"]:
                h = basic_transformer_block(
                    blk, h, cfg.temp_num_heads, backend="xla", compute_dtype=compute_dtype
                )
        h = linear(params["temp"]["proj_out"], h, compute_dtype)
        h = h.reshape(b, eh * ew, f, ec).transpose(0, 2, 1, 3).reshape(n, eh, ew, ec)
        emb = residual + h
    return emb


# ---------------------------------------------------------------------------
# ControlNet model
# ---------------------------------------------------------------------------


def init_controlnet(key: jax.Array, cfg: ControlNetConfig) -> dict:
    u = cfg.unet
    n = u.num_levels
    ks = rsplit(key, n + 6)
    boc = u.block_out_channels

    p: dict = {
        "conv_in": conv_init(ks[0], (3, 3, u.in_channels, boc[0])),
        "time_embedding": init_timestep_embedding(ks[1], boc[0], u.time_embed_dim),
        "add_embedding": init_timestep_embedding(
            ks[2], u.projection_class_embeddings_input_dim, u.time_embed_dim
        ),
        "controlnet_cond_embedding": init_hint_encoder(ks[3], cfg.hint),
        "down_blocks": [],
        "controlnet_down_blocks": [zero_conv_init((1, 1, boc[0], boc[0]))],
    }

    out_ch = boc[0]
    for i in range(n):
        in_ch, out_ch = out_ch, boc[i]
        is_final = i == n - 1
        p["down_blocks"].append(
            init_down_block(
                ks[4 + i], in_ch, out_ch, u.time_embed_dim, u.layers_per_block,
                u.cross_attention_levels[i], u.num_attention_heads[i],
                u.transformer_layers_per_block, u.cross_attention_dim,
                add_downsample=not is_final,
            )
        )
        for _ in range(u.layers_per_block):
            p["controlnet_down_blocks"].append(zero_conv_init((1, 1, out_ch, out_ch)))
        if not is_final:
            p["controlnet_down_blocks"].append(zero_conv_init((1, 1, out_ch, out_ch)))

    p["controlnet_mid_block"] = zero_conv_init((1, 1, boc[-1], boc[-1]))
    p["mid_block"] = init_mid_block(
        ks[4 + n], boc[-1], u.time_embed_dim, u.num_attention_heads[-1],
        u.transformer_layers_per_block, u.cross_attention_dim,
    )
    return p


def controlnet_from_unet(controlnet_params: dict, unet_params: dict) -> dict:
    """Copy encoder weights from a UNet (ControlNetSDVModel.from_unet,
    controlnet_sdv.py:698-707): conv_in, time/add embeddings, down blocks, mid."""
    import copy

    p = dict(controlnet_params)
    for name in ("conv_in", "time_embedding", "add_embedding", "down_blocks", "mid_block"):
        p[name] = copy.deepcopy(unet_params[name])
    return p


def controlnet_forward(
    params: dict,
    cfg: ControlNetConfig,
    sample: jax.Array,
    timestep: jax.Array,
    encoder_hidden_states: jax.Array,
    added_time_ids: jax.Array,
    controlnet_cond: Optional[jax.Array] = None,
    conditioning_scale: float = 1.0,
    bbox_cond: Optional[jax.Array] = None,
    camera_cond: Optional[jax.Array] = None,
    rot_id: Optional[jax.Array] = None,
    entity_cond: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    attention_backend: str = "auto",
    remat: bool = False,
    hint_embedding: Optional[jax.Array] = None,
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Returns (down_block_residuals (12-tuple for the 4-level config),
    mid_block_residual), each scaled by conditioning_scale
    (controlnet_sdv.py:516-650).

    `hint_embedding` short-circuits the hint conv stack: the embedding depends
    only on the control video, so the sampling loop computes it ONCE and
    reuses it across all denoise steps (the reference recomputes it per step,
    pipeline...controlnet.py:538-547)."""
    u = cfg.unet
    b, f, h, w, _ = sample.shape
    emb = compute_embeddings(params, u, timestep, added_time_ids, b, f, compute_dtype)
    context = jnp.repeat(encoder_hidden_states.astype(compute_dtype), f, axis=0)

    x = sample.reshape(b * f, h, w, sample.shape[-1]).astype(compute_dtype)
    x = conv2d(params["conv_in"], x, compute_dtype=compute_dtype)

    if hint_embedding is not None:
        x = x + hint_embedding.astype(x.dtype)
    elif controlnet_cond is not None:
        hint = hint_encoder(
            params["controlnet_cond_embedding"], cfg.hint,
            controlnet_cond.astype(compute_dtype), f,
            bbox_cond=bbox_cond, camera_cond=camera_cond, rot_id=rot_id,
            entity_cond=entity_cond, compute_dtype=compute_dtype,
        )
        x = x + hint

    image_only_indicator = jnp.zeros((b, f), jnp.float32)

    # Remat, matching the UNet (train...blender_14.py:975-976); "unit" pushes
    # the checkpoint boundary inside the blocks (see unet.py/blocks.py).
    units = remat == "unit"
    ckpt = (lambda fn: jax.checkpoint(fn)) if (remat and not units) else (lambda fn: fn)

    skips: Tuple[jax.Array, ...] = (x,)
    for i, db_params in enumerate(params["down_blocks"]):
        x, new_skips = ckpt(
            lambda p, xx, ee, cc, _i=i: down_block(
                p, xx, ee, cc, f, u.num_attention_heads[_i], image_only_indicator,
                backend=attention_backend, compute_dtype=compute_dtype,
                remat_units=units,
            )
        )(db_params, x, emb, context if u.cross_attention_levels[i] else None)
        skips = skips + new_skips

    x = ckpt(
        lambda p, xx, ee, cc: mid_block(
            p, xx, ee, cc, f, u.num_attention_heads[-1], image_only_indicator,
            backend=attention_backend, compute_dtype=compute_dtype,
            remat_units=units,
        )
    )(params["mid_block"], x, emb, context)

    down_residuals = tuple(
        conv2d(zc, s, compute_dtype=compute_dtype) * conditioning_scale
        for zc, s in zip(params["controlnet_down_blocks"], skips)
    )
    mid_residual = conv2d(params["controlnet_mid_block"], x, compute_dtype=compute_dtype) * conditioning_scale
    return down_residuals, mid_residual
