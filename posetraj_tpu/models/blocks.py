"""SVD UNet blocks: CrossAttn/plain down blocks, mid block, up blocks.

Per diffusers==0.24.0 unet_3d_blocks.py (consumed by the reference at
unet_spatio_temporal_condition_controlnet.py:13 via get_down_block /
get_up_block / UNetMidBlockSpatioTemporal). Epsilons follow 0.24.0:
CrossAttnDownBlockSpatioTemporal hardcodes resnet eps=1e-6, the plain down
block and the mid block hardcode 1e-5, and BOTH up-block types land on their
1e-6 defaults (the SDV branches of get_up_block never forward `resnet_eps`,
so the UNet's resnet_eps=1e-5 argument is ignored on the up path).

All blocks operate on fused-frame spatial tensors (B*F, H, W, C) with
temb (B*F, temb_dim) and CLIP context (B*F, 1, cross_dim).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from posetraj_tpu.core.init import conv_init, rsplit
from posetraj_tpu.models.resnet import init_spatio_temporal_res_block, spatio_temporal_res_block
from posetraj_tpu.models.transformer import (
    init_transformer_spatio_temporal,
    transformer_spatio_temporal,
)
from posetraj_tpu.ops.primitives import downsample_2x, upsample_nearest_2x

CROSS_ATTN_EPS = 1e-6
PLAIN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Down blocks
# ---------------------------------------------------------------------------


def init_down_block(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    temb_channels: int,
    num_layers: int,
    has_cross_attention: bool,
    num_heads: int,
    transformer_layers: int,
    cross_attention_dim: int,
    add_downsample: bool,
) -> dict:
    ks = rsplit(key, 2 * num_layers + 1)
    p: dict = {"resnets": [], "attentions": [] if has_cross_attention else None}
    for i in range(num_layers):
        cin = in_channels if i == 0 else out_channels
        p["resnets"].append(init_spatio_temporal_res_block(ks[i], cin, out_channels, temb_channels))
        if has_cross_attention:
            p["attentions"].append(
                init_transformer_spatio_temporal(
                    ks[num_layers + i], out_channels, num_heads, transformer_layers, cross_attention_dim
                )
            )
    if p["attentions"] is None:
        del p["attentions"]
    if add_downsample:
        p["downsampler"] = conv_init(ks[-1], (3, 3, out_channels, out_channels))
    return p


def down_block(
    params: dict,
    x: jax.Array,
    temb: jax.Array,
    context: Optional[jax.Array],
    num_frames: int,
    num_heads: int,
    image_only_indicator: Optional[jax.Array],
    fidelity_time_context_order: bool = True,
    backend: str = "auto",
    compute_dtype=None,
    remat_units: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """remat_units: checkpoint each (resnet, transformer) unit instead of the
    caller checkpointing the whole block — the unit boundaries here coincide
    with the skips (saved for the backward anyway), so the finer granularity
    shrinks the backward's live set at ~zero extra residual memory. This is
    the flagship-recipe 16 GB HBM lever (the block-granularity step compiles
    34 MB over on v5e)."""
    has_attn = "attentions" in params
    eps = CROSS_ATTN_EPS if has_attn else PLAIN_EPS
    ckpt = (lambda fn: jax.checkpoint(fn)) if remat_units else (lambda fn: fn)
    skips: List[jax.Array] = []
    for i, res_p in enumerate(params["resnets"]):
        attn_p = params["attentions"][i] if has_attn else None

        def unit(rp, ap, xx, tt, cc):
            xx = spatio_temporal_res_block(
                rp, xx, tt, num_frames, image_only_indicator, eps=eps,
                compute_dtype=compute_dtype,
            )
            if ap is not None:
                xx = transformer_spatio_temporal(
                    ap, xx, cc, num_frames, num_heads, image_only_indicator,
                    fidelity_time_context_order, backend, compute_dtype,
                )
            return xx

        x = ckpt(unit)(res_p, attn_p, x, temb, context)
        skips.append(x)
    if "downsampler" in params:
        x = downsample_2x(params["downsampler"], x, compute_dtype=compute_dtype)
        skips.append(x)
    return x, tuple(skips)


# ---------------------------------------------------------------------------
# Mid block
# ---------------------------------------------------------------------------


def init_mid_block(
    key: jax.Array,
    channels: int,
    temb_channels: int,
    num_heads: int,
    transformer_layers: int,
    cross_attention_dim: int,
) -> dict:
    k1, k2, k3 = rsplit(key, 3)
    return {
        "resnets": [
            init_spatio_temporal_res_block(k1, channels, channels, temb_channels),
            init_spatio_temporal_res_block(k2, channels, channels, temb_channels),
        ],
        "attentions": [
            init_transformer_spatio_temporal(k3, channels, num_heads, transformer_layers, cross_attention_dim)
        ],
    }


def mid_block(
    params: dict,
    x: jax.Array,
    temb: jax.Array,
    context: jax.Array,
    num_frames: int,
    num_heads: int,
    image_only_indicator: Optional[jax.Array],
    fidelity_time_context_order: bool = True,
    backend: str = "auto",
    compute_dtype=None,
    remat_units: bool = False,
) -> jax.Array:
    ckpt = (lambda fn: jax.checkpoint(fn)) if remat_units else (lambda fn: fn)

    def unit1(p, xx, tt, cc):
        xx = spatio_temporal_res_block(
            p["resnets"][0], xx, tt, num_frames, image_only_indicator, eps=PLAIN_EPS,
            compute_dtype=compute_dtype,
        )
        return transformer_spatio_temporal(
            p["attentions"][0], xx, cc, num_frames, num_heads,
            image_only_indicator, fidelity_time_context_order, backend, compute_dtype,
        )

    def unit2(p, xx, tt):
        return spatio_temporal_res_block(
            p["resnets"][1], xx, tt, num_frames, image_only_indicator, eps=PLAIN_EPS,
            compute_dtype=compute_dtype,
        )

    x = ckpt(unit1)(params, x, temb, context)
    return ckpt(unit2)(params, x, temb)


# ---------------------------------------------------------------------------
# Up blocks
# ---------------------------------------------------------------------------


def init_up_block(
    key: jax.Array,
    in_channels: int,
    prev_output_channel: int,
    out_channels: int,
    temb_channels: int,
    num_layers: int,
    has_cross_attention: bool,
    num_heads: int,
    transformer_layers: int,
    cross_attention_dim: int,
    add_upsample: bool,
) -> dict:
    ks = rsplit(key, 2 * num_layers + 1)
    p: dict = {"resnets": []}
    if has_cross_attention:
        p["attentions"] = []
    for i in range(num_layers):
        res_skip = in_channels if (i == num_layers - 1) else out_channels
        res_in = prev_output_channel if i == 0 else out_channels
        p["resnets"].append(
            init_spatio_temporal_res_block(ks[i], res_in + res_skip, out_channels, temb_channels)
        )
        if has_cross_attention:
            p["attentions"].append(
                init_transformer_spatio_temporal(
                    ks[num_layers + i], out_channels, num_heads, transformer_layers, cross_attention_dim
                )
            )
    if add_upsample:
        p["upsampler"] = conv_init(ks[-1], (3, 3, out_channels, out_channels))
    return p


def up_block(
    params: dict,
    x: jax.Array,
    skips: Tuple[jax.Array, ...],
    temb: jax.Array,
    context: Optional[jax.Array],
    num_frames: int,
    num_heads: int,
    image_only_indicator: Optional[jax.Array],
    fidelity_time_context_order: bool = True,
    backend: str = "auto",
    compute_dtype=None,
    remat_units: bool = False,
) -> jax.Array:
    """`skips` holds this block's residuals, consumed last-first
    (unet...controlnet.py:474-475). remat_units: see down_block."""
    has_attn = "attentions" in params
    # Both up-block types use eps=1e-6 (their class default; diffusers 0.24.0
    # get_up_block's SDV branches drop the resnet_eps argument).
    eps = CROSS_ATTN_EPS
    ckpt = (lambda fn: jax.checkpoint(fn)) if remat_units else (lambda fn: fn)
    skips = list(skips)
    for i, res_p in enumerate(params["resnets"]):
        skip = skips.pop()
        attn_p = params["attentions"][i] if has_attn else None

        def unit(rp, ap, xx, sk, tt, cc):
            xx = jnp.concatenate([xx, sk.astype(xx.dtype)], axis=-1)
            xx = spatio_temporal_res_block(
                rp, xx, tt, num_frames, image_only_indicator, eps=eps,
                compute_dtype=compute_dtype,
            )
            if ap is not None:
                xx = transformer_spatio_temporal(
                    ap, xx, cc, num_frames, num_heads, image_only_indicator,
                    fidelity_time_context_order, backend, compute_dtype,
                )
            return xx

        x = ckpt(unit)(res_p, attn_p, x, skip, temb, context)
    if "upsampler" in params:
        x = upsample_nearest_2x(params["upsampler"], x, compute_dtype=compute_dtype)
    return x
