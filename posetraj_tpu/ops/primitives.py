"""NN primitive ops, channels-last (NHWC), mixed-precision aware.

TPU-first conventions:
  * Convs run NHWC / HWIO — the MXU-friendly layout XLA tiles best — instead
    of the reference's torch NCHW.
  * Matmuls/convs run in the policy compute dtype (bf16 by default); all
    normalization statistics are computed in fp32.
  * Video tensors are (B, F, H, W, C); spatial ops fold frames into batch
    ((B*F, H, W, C)) exactly like the reference's flatten(0, 1)
    (unet_spatio_temporal_condition_controlnet.py:421) but at the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def linear(params: dict, x: jax.Array, compute_dtype=None) -> jax.Array:
    """y = x @ W + b with W stored (in, out)."""
    dt = compute_dtype or x.dtype
    y = jnp.dot(x.astype(dt), params["kernel"].astype(dt), preferred_element_type=dt)
    if "bias" in params:
        y = y + params["bias"].astype(dt)
    return y


def conv2d(
    params: dict,
    x: jax.Array,
    stride: int = 1,
    padding="SAME",
    compute_dtype=None,
) -> jax.Array:
    """2D conv over (N, H, W, C) with HWIO kernel.

    `padding` accepts "SAME"/"VALID" or an explicit ((top,bottom),(left,right))
    pair — the VAE downsampler needs torch's asymmetric pad (0,1,0,1).

    Under an active spatial-sharding context (parallel/spmd.py) the W axis of
    `x` is a shard of the global width: the conv exchanges halo columns with
    its W-neighbors and runs VALID along W, reproducing the global conv's
    local output shard exactly (edge shards receive ppermute zeros == conv
    zero padding).
    """
    from posetraj_tpu.parallel import spmd

    dt = compute_dtype or x.dtype
    ctx = spmd.current()
    kh, kw = params["kernel"].shape[:2]
    if ctx is not None and ctx.w_sharded_at(x.shape[-3]) and (kw > 1 or stride > 1):
        if padding == "SAME":
            # SAME for odd kernels at stride 1 == symmetric torch padding.
            pad_h, pad_w = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        elif padding == "VALID":
            pad_h, pad_w = ((0, 0), (0, 0))
        else:
            pad_h, pad_w = padding
        halo_l, halo_r = spmd.conv_halo_plan(kw, stride, pad_w)
        xh = spmd.halo_exchange_w(x.astype(dt), halo_l, halo_r, ctx)
        y = lax.conv_general_dilated(
            xh,
            params["kernel"].astype(dt),
            window_strides=(stride, stride),
            padding=(pad_h, (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
    else:
        y = lax.conv_general_dilated(
            x.astype(dt),
            params["kernel"].astype(dt),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
    if "bias" in params:
        y = y + params["bias"].astype(dt)
    return y


def conv3d_temporal(params: dict, x: jax.Array, compute_dtype=None) -> jax.Array:
    """Temporal conv with kernel (kf, 1, 1) over (N, F, H, W, C).

    Replaces the reference's torch Conv3d (3,1,1) in TemporalResnetBlock /
    the VAE time_conv_out (diffusers==0.24.0 resnet.py TemporalResnetBlock).
    Kernel layout: (kf, 1, 1, in, out).

    Computed as kf frame-shifted 2D matmuls rather than a real 3D conv: the
    (kf,1,1) stencil has no spatial extent, and XLA's NDHWC conv lowers to a
    T(2,128)-tiled layout that ran at ~52 TF/s on v5e (~3 ms per L0 call in
    the device trace); the same FLOPs as (B*F*H*W, C) @ (C, C) matmuls run in
    the MXU-native layout (~150 TF/s).
    """
    dt = compute_dtype or x.dtype
    kern = params["kernel"].astype(dt)
    kf = kern.shape[0]
    xb = x.astype(dt)
    n, f, h, w, c = xb.shape
    pad = kf // 2
    xp = jnp.pad(xb, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    y = None
    for j in range(kf):
        shifted = lax.slice_in_dim(xp, j, j + f, axis=1)
        term = jnp.dot(
            shifted.reshape(-1, c), kern[j, 0, 0], preferred_element_type=dt
        ).reshape(n, f, h, w, -1)
        y = term if y is None else y + term
    if "bias" in params:
        y = y + params["bias"].astype(dt)
    return y


def group_norm(params: dict, x: jax.Array, num_groups: int = 32, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over channels-last input, stats in fp32.

    x: (..., C) with C % num_groups == 0; normalizes over all non-leading-batch
    spatial dims + the within-group channel dim, matching torch GroupNorm on
    (N, C, *spatial).
    """
    from posetraj_tpu.parallel import spmd
    from posetraj_tpu.ops.pallas_groupnorm import fused_group_norm, fused_group_norm_applicable

    ctx = spmd.current()
    psum_axis = (
        ctx.sp_axis
        if (ctx is not None and x.ndim >= 4 and ctx.w_sharded_at(x.shape[-3]))
        else None
    )
    if fused_group_norm_applicable(x, num_groups):
        return fused_group_norm(
            x, params["scale"], params["bias"], num_groups, eps, act=False, psum_axis=psum_axis
        )
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    if c % num_groups != 0:
        if c >= num_groups:
            # A real config with indivisible channels is a wiring bug; torch
            # GroupNorm would also refuse it. Silently "fixing" the group
            # count would change the math without a trace.
            raise ValueError(f"group_norm: {c} channels not divisible by {num_groups} groups")
        # Tiny test configs have fewer channels than the standard 32 groups;
        # fall back to the largest divisor.
        import math

        num_groups = math.gcd(c, num_groups)
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    if psum_axis is not None:
        # W-sharded spatial stats: local partial [sum, sumsq] per (sample,
        # group), reduced over the shard axis — identical math to the global
        # mean/var up to summation order.
        cnt = xf.shape[1] * xf.shape[3] * ctx.sp_size
        s1 = lax.psum(xf.sum(axis=(1, 3), keepdims=True), psum_axis)
        s2 = lax.psum((xf * xf).sum(axis=(1, 3), keepdims=True), psum_axis)
        mean = s1 / cnt
        var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    else:
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    out = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm_silu(
    params: dict, x: jax.Array, num_groups: int = 32, eps: float = 1e-5, act: bool = True,
    add: jax.Array | None = None,
) -> jax.Array:
    """GroupNorm with (optionally) fused SiLU: dispatches to the single-pass
    Pallas kernel on TPU when the per-sample block fits VMEM, else the XLA
    path. Resnet blocks always normalize-then-silu, so fusing both into one
    HBM pass saves ~2ms per call at UNet level-0 shapes on v5e.

    add: optional (N, C) per-sample or (N, F, C) per-frame channel vector
    added to x before the norm — the resnet time-embedding broadcast. The
    Pallas path folds it into the kernels' existing HBM passes (the
    standalone broadcast-add is a full read+write over the activation that
    XLA cannot fuse into the custom calls); other paths add it explicitly."""
    from posetraj_tpu.parallel import spmd
    from posetraj_tpu.ops.pallas_groupnorm import (
        _broadcast_add,
        addend_foldable,
        fused_group_norm,
        fused_group_norm_applicable,
    )

    if fused_group_norm_applicable(x, num_groups):
        if add is not None and not addend_foldable(x, add):
            x = _broadcast_add(x, add)
            add = None
        ctx = spmd.current()
        psum_axis = (
            ctx.sp_axis
            if (ctx is not None and x.ndim >= 4 and ctx.w_sharded_at(x.shape[-3]))
            else None
        )
        return fused_group_norm(
            x, params["scale"], params["bias"], num_groups, eps, act,
            psum_axis=psum_axis, add=add,
        )
    if add is not None:
        x = _broadcast_add(x, add)
    h = group_norm(params, x, num_groups, eps)
    return silu(h) if act else h


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last dim, stats in fp32. Large TPU activations
    dispatch to the single-pass Pallas kernel (ops/pallas_groupnorm.py:
    fused_layer_norm) — one read+write instead of XLA's fp32-widened
    stat+normalize fusion chains."""
    from posetraj_tpu.ops.pallas_groupnorm import (
        fused_layer_norm,
        fused_layer_norm_applicable,
    )

    if fused_layer_norm_applicable(x):
        return fused_layer_norm(x, params["scale"], params["bias"], eps)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    out = out * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def gelu(x: jax.Array) -> jax.Array:
    # torch nn.GELU default is the exact erf form; diffusers GEGLU uses F.gelu.
    return jax.nn.gelu(x, approximate=False)


def geglu(params: dict, x: jax.Array, compute_dtype=None) -> jax.Array:
    """GEGLU feed-forward gate (diffusers attention.py GEGLU): one fused
    projection to 2*inner, split, gelu-gate."""
    h = linear(params, x, compute_dtype)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * gelu(gate)


def downsample_2x(params: dict, x: jax.Array, asymmetric_pad: bool = False, compute_dtype=None) -> jax.Array:
    """Stride-2 3x3 conv downsample (diffusers Downsample2D, use_conv=True).

    UNet blocks use padding=1 (SAME for odd sizes); the VAE encoder uses
    padding=0 with manual (0,1,0,1) pad — `asymmetric_pad=True`.

    Replicated-deep-level boundary (parallel/spmd.py SpmdCtx.replicated_h):
    when the OUTPUT level runs replicated but the input is W-sharded — the
    eval-res ladder 72 -> 36 -> 18 -> 9 under sp=2 stops dividing at the
    deepest level — the shards all-gather W here and the conv runs on the
    full width with the sharding context suspended (plain SAME semantics ==
    the global conv).
    """
    from posetraj_tpu.parallel import spmd

    if asymmetric_pad:
        pad = ((0, 1), (0, 1))
    else:
        pad = ((1, 1), (1, 1))
    ctx = spmd.current()
    h_in = x.shape[-3]
    if (
        ctx is not None
        and ctx.w_sharded_at(h_in)
        and not ctx.w_sharded_at(-(-h_in // 2))
    ):
        x = spmd.gather_w(x, ctx)
        with spmd.local_tokens():
            return conv2d(params, x, stride=2, padding=pad, compute_dtype=compute_dtype)
    return conv2d(params, x, stride=2, padding=pad, compute_dtype=compute_dtype)


def upsample_nearest_2x(params: dict, x: jax.Array, compute_dtype=None) -> jax.Array:
    """Nearest x2 upsample + 3x3 conv (diffusers Upsample2D, use_conv=True).

    Boundary twin of downsample_2x: leaving a replicated deep level for a
    W-sharded one, the upsample + conv run on the full width (context
    suspended) and each shard slices its local W block back out.
    """
    from posetraj_tpu.parallel import spmd

    ctx = spmd.current()
    h_in = x.shape[-3]
    if (
        ctx is not None
        and ctx.sharded_w
        and not ctx.w_sharded_at(h_in)
        and ctx.w_sharded_at(2 * h_in)
    ):
        with spmd.local_tokens():
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            y = conv2d(params, x, stride=1, padding=((1, 1), (1, 1)),
                       compute_dtype=compute_dtype)
        return spmd.scatter_w(y, ctx)
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(params, x, stride=1, padding=((1, 1), (1, 1)), compute_dtype=compute_dtype)
