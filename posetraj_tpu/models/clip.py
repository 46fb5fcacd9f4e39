"""CLIP ViT-H/14 vision encoder with projection (frozen image conditioner).

Rebuild of transformers CLIPVisionModelWithProjection (laion/CLIP-ViT-H-14)
as loaded by the reference (train_svd_traj_blender_14.py:869-873). Only the
vision tower + visual projection are needed: the pipeline consumes
`image_embeds` (B, 1024) -> unsqueeze to (B, 1, 1024)
(pipeline_stable_video_diffusion_controlnet.py:156-157).

laion ViT-H config: patch 14, image 224, hidden 1280, 32 layers, 16 heads,
GELU MLP (hidden_act="gelu", unlike OpenAI's quick_gelu), projection 1024.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from posetraj_tpu.configs import CLIPVisionConfig
from posetraj_tpu.core.init import conv_init, linear_init, norm_init, normal, rsplit
from posetraj_tpu.ops.attention import attention
from posetraj_tpu.ops.primitives import gelu, layer_norm, linear


def init_clip_vision(key: jax.Array, cfg: CLIPVisionConfig) -> dict:
    ks = rsplit(key, cfg.num_layers + 5)
    num_patches = (cfg.image_size // cfg.patch_size) ** 2
    p: dict = {
        "class_embedding": normal(ks[0], (cfg.hidden_size,), 0.02),
        "patch_embedding": conv_init(
            ks[1], (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size), use_bias=False
        ),
        "position_embedding": normal(ks[2], (num_patches + 1, cfg.hidden_size), 0.02),
        "pre_layernorm": norm_init(cfg.hidden_size),
        "layers": [],
        "post_layernorm": norm_init(cfg.hidden_size),
        "visual_projection": linear_init(ks[3], cfg.hidden_size, cfg.projection_dim, use_bias=False),
    }
    for i in range(cfg.num_layers):
        lks = rsplit(ks[4 + i], 6)
        p["layers"].append(
            {
                "layer_norm1": norm_init(cfg.hidden_size),
                "q_proj": linear_init(lks[0], cfg.hidden_size, cfg.hidden_size),
                "k_proj": linear_init(lks[1], cfg.hidden_size, cfg.hidden_size),
                "v_proj": linear_init(lks[2], cfg.hidden_size, cfg.hidden_size),
                "out_proj": linear_init(lks[3], cfg.hidden_size, cfg.hidden_size),
                "layer_norm2": norm_init(cfg.hidden_size),
                "fc1": linear_init(lks[4], cfg.hidden_size, cfg.intermediate_size),
                "fc2": linear_init(lks[5], cfg.intermediate_size, cfg.hidden_size),
            }
        )
    return p


def _encoder_layer(p: dict, x: jax.Array, cfg: CLIPVisionConfig, compute_dtype) -> jax.Array:
    h = layer_norm(p["layer_norm1"], x, eps=cfg.layer_norm_eps)
    q = linear(p["q_proj"], h, compute_dtype)
    k = linear(p["k_proj"], h, compute_dtype)
    v = linear(p["v_proj"], h, compute_dtype)
    a = attention(q, k, v, cfg.num_heads, backend="xla")
    x = x + linear(p["out_proj"], a, compute_dtype)
    h = layer_norm(p["layer_norm2"], x, eps=cfg.layer_norm_eps)
    h = linear(p["fc2"], gelu(linear(p["fc1"], h, compute_dtype)), compute_dtype)
    return x + h


def clip_image_embeds(
    params: dict,
    cfg: CLIPVisionConfig,
    pixel_values: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """(B, 224, 224, 3) CLIP-normalized pixels -> (B, projection_dim) image_embeds."""
    b = pixel_values.shape[0]
    x = pixel_values.astype(compute_dtype)
    patches = jax.lax.conv_general_dilated(
        x,
        params["patch_embedding"]["kernel"].astype(compute_dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(compute_dtype)[None, None, :], (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + params["position_embedding"].astype(compute_dtype)[None]
    x = layer_norm(params["pre_layernorm"], x, eps=cfg.layer_norm_eps)
    for layer in params["layers"]:
        x = _encoder_layer(layer, x, cfg, compute_dtype)
    pooled = layer_norm(params["post_layernorm"], x[:, 0, :], eps=cfg.layer_norm_eps)
    return linear(params["visual_projection"], pooled, compute_dtype)


def clip_preprocess(images: jax.Array, cfg: CLIPVisionConfig) -> jax.Array:
    """Normalize [0,1] RGB (B, H, W, 3) with CLIP mean/std. The antialiased
    224x224 resize (reference's _resize_with_antialiasing) lives in
    posetraj_tpu/ops/resize.py and is applied by the caller first."""
    mean = jnp.asarray(cfg.image_mean, images.dtype)
    std = jnp.asarray(cfg.image_std, images.dtype)
    return (images - mean) / std
