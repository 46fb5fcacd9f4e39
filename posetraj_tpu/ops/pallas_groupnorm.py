"""Fused GroupNorm(+SiLU) Pallas kernels.

The UNet runs ~100 GroupNorm->SiLU pairs per denoise step; as separate XLA
ops each costs multiple fp32 passes over a (28, 72, 128, 320)-sized activation
(~2.3 ms measured on v5e at level 0 — pure HBM traffic). Here the op is two
small-block kernels plus a tiny jnp combine:

  1. stats kernel: per (sample, row-block) partial [sum, sum_sq] per group,
     gathered with a (C, G) one-hot membership matmul (Mosaic cannot split
     the lane/channel dimension, so no (S, G, C/G) reshape).
  2. jnp: combine partials -> per-channel scale/shift (N, C), fp32, tiny.
  3. normalize kernel: y = x * w + b (optionally SiLU), same row blocks.

Total HBM traffic: 3 bf16 passes over the activation vs XLA's 4+ fp32-widened
passes; VMEM stays at a few row blocks regardless of activation size.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _largest_divisor(s: int, cap: int) -> int:
    for d in range(min(cap, s), 0, -1):
        if s % d == 0:
            return d
    return s


def _membership(c: int, num_groups: int):
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    return (ch_ids // (c // num_groups) == g_ids).astype(jnp.float32)  # (C, G)


def _stats_kernel(x_ref, *rest, num_groups: int, rb: int, s_len: int):
    """x_ref: (1, RB, C); o_ref: (1, NB, 2G) revisited across the row-block
    grid — program (i, j) fills row j with this block's [sum_g, sumsq_g].
    Rows past s_len (padding for non-divisible spatial sizes) are zeroed so
    they cannot contribute to the statistics. Optional add_ref (1, 1, C): a
    channel vector (constant within the block — per sample, or per frame via
    the BlockSpec index map) added to x before the statistics, folding the
    resnet time-embedding broadcast into this kernel's existing HBM pass."""
    add_ref, o_ref = (rest if len(rest) == 2 else (None, rest[0]))
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    if add_ref is not None:
        x = x + add_ref[0, 0].astype(jnp.float32)
    if s_len % rb != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + j * rb
        x = jnp.where(row < s_len, x, 0.0)
    m = _membership(x.shape[-1], num_groups)
    s1 = jnp.sum(jnp.dot(x, m, preferred_element_type=jnp.float32), axis=0, keepdims=True)
    s2 = jnp.sum(jnp.dot(x * x, m, preferred_element_type=jnp.float32), axis=0, keepdims=True)
    o_ref[0, pl.ds(j, 1), :] = jnp.concatenate([s1, s2], axis=-1)


def _norm_kernel(x_ref, w_ref, b_ref, *rest, act: bool):
    """y = (x [+ add]) * w + b (+SiLU). x_ref/o_ref: (1, RB, C); w/b/add:
    (1, 1, C) per sample (or per frame)."""
    add_ref, o_ref = (rest if len(rest) == 2 else (None, rest[0]))
    x = x_ref[0].astype(jnp.float32)
    if add_ref is not None:
        x = x + add_ref[0, 0].astype(jnp.float32)
    y = x * w_ref[0] + b_ref[0]
    if act:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "act", "interpret", "psum_axis")
)
def _fused_group_norm_impl(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: bool = False,
    interpret: bool = False,
    psum_axis=None,
    add: jax.Array | None = None,
) -> jax.Array:
    n = x.shape[0]
    c = x.shape[-1]
    xf = x.reshape(n, -1, c)
    s = xf.shape[1]
    # Row blocks bounded in bytes, not rows: (rb, C) tiles must fit scoped
    # VMEM with double buffering + the fp32 normalize intermediate (~16M
    # limit), so wide-channel shapes take proportionally shorter blocks.
    # rb must be a sublane multiple (8); non-divisible spatial sizes are row-
    # padded and the padding masked out of the statistics in-kernel.
    cap = max(8, ((1 << 18) // c) & ~7)
    # Per-frame addend (N, F, C): row blocks must not straddle frames so the
    # in-kernel addend is a single channel vector — pick rb from the
    # per-frame row count (divides s, so no padding either). The caller's
    # gate (group_norm_silu) guarantees an aligned divisor exists.
    frames = add.shape[1] if add is not None and add.ndim == 3 else 1
    rb = _largest_divisor(s // frames, cap)
    if rb % 8 != 0:  # no sublane-aligned divisor: pad rows and mask stats
        assert frames == 1, "per-frame addend requires an aligned row divisor"
        rb = min(cap, -(-s // 8) * 8)
    s_pad = -(-s // rb) * rb
    if s_pad != s:
        xf = jnp.pad(xf, ((0, 0), (0, s_pad - s), (0, 0)))
    nb = s_pad // rb
    cg = c // num_groups

    if add is not None:
        # 4D (N, F, 1, C) with (1, 1, 1, C) blocks: the last two block dims
        # equal the array dims, satisfying Mosaic's (8, 128)-tiling rule for
        # any frame count (a 3D (N, F, C) layout puts F in the sublane dim,
        # where a 1-row block is illegal unless F == 1).
        add4 = add.reshape(n, frames, 1, c)
        if frames > 1:
            # rb | rows_per_frame and rb | s (no padding): block j sits fully
            # inside frame (j*rb) // rows_per_frame.
            rows_per_frame = s // frames
            idx = lambda i, j: (i, j * rb // rows_per_frame, 0, 0)
        else:
            idx = lambda i, j: (i, 0, 0, 0)
        add_spec = [pl.BlockSpec((1, 1, 1, c), idx)]
        add_in = [add4]
    else:
        add_spec, add_in = [], []

    partials = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=num_groups, rb=rb, s_len=s),
        grid=(n, nb),
        in_specs=[pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0))] + add_spec,
        out_specs=pl.BlockSpec((1, nb, 2 * num_groups), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, nb, 2 * num_groups), jnp.float32),
        interpret=interpret,
    )(xf, *add_in)

    sums = partials.sum(axis=1)  # (N, 2G)
    n_shards = 1
    if psum_axis is not None:
        # W-sharded spatial statistics (parallel/spmd.py): the local partials
        # cover 1/n of the global H*W extent — reduce over the shard axis.
        sums = jax.lax.psum(sums, psum_axis)
        n_shards = jax.lax.psum(1, psum_axis)
    denom = float(s * cg) * n_shards
    mean_g = sums[:, :num_groups] / denom
    var_g = sums[:, num_groups:] / denom - mean_g**2
    inv_g = jax.lax.rsqrt(jnp.maximum(var_g, 0.0) + eps)  # (N, G)
    # Expand per-group stats to per-channel via repeat along the group axis.
    mean_c = jnp.repeat(mean_g, cg, axis=-1)
    inv_c = jnp.repeat(inv_g, cg, axis=-1)
    w = inv_c * scale.astype(jnp.float32)[None]  # (N, C)
    b = bias.astype(jnp.float32)[None] - mean_c * w

    out = pl.pallas_call(
        functools.partial(_norm_kernel, act=act),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ] + add_spec,
        out_specs=pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        interpret=interpret,
    )(xf, w[:, None, :], b[:, None, :], *add_in)
    return out[:, :s].reshape(x.shape)


def _broadcast_add(x: jax.Array, add: jax.Array) -> jax.Array:
    """x (N, *spatial, C) + add (N, C) or (N, F, C) broadcast over the
    remaining spatial dims (XLA fallback for the in-kernel addend fold)."""
    lead = add.shape[:-1]
    shape = lead + (1,) * (x.ndim - len(lead) - 1) + add.shape[-1:]
    return x + add.reshape(shape).astype(x.dtype)


def _ref_group_norm(x, scale, bias, num_groups, eps, act, psum_axis=None, add=None):
    """Plain-XLA groupnorm(+silu), used only for the custom_vjp backward
    (mirrors ops/primitives.group_norm without the Pallas dispatch).
    Differentiating through the psum'd statistics gives the correct sharded
    gradient (psum transposes to psum under shard_map)."""
    if add is not None:
        x = _broadcast_add(x, add)
    orig_dtype = x.dtype
    n, c = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    if psum_axis is not None:
        cnt = xf.shape[1] * xf.shape[3] * jax.lax.psum(1, psum_axis)
        s1 = jax.lax.psum(xf.sum(axis=(1, 3), keepdims=True), psum_axis)
        s2 = jax.lax.psum((xf * xf).sum(axis=(1, 3), keepdims=True), psum_axis)
        mean = s1 / cnt
        var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    else:
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = xf.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act:
        y = y * jax.nn.sigmoid(y)
    return y.astype(orig_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: bool = False,
    interpret: bool = False,
    psum_axis=None,
    add: jax.Array | None = None,
) -> jax.Array:
    """(N, ..., C) channels-last GroupNorm with optional fused SiLU.

    Forward runs the Pallas kernels; gradients route through the plain XLA
    formulation (custom_vjp — Pallas kernels are not differentiable and the
    trainable ControlNet's groupnorms sit on the grad path).

    psum_axis: mesh axis name for W-sharded spatial statistics
    (parallel/spmd.py) — the stats kernel's partials are psum'd over it.

    add: optional (N, C) per-sample or (N, F, C) per-frame channel vector
    added to x INSIDE both kernels before the statistics — folds the resnet
    time-embedding broadcast (reference ResnetBlock2D's `h + temb`,
    resnet.py) into the norm's existing HBM passes, deleting the standalone
    read+write broadcast-add pass over the activation."""
    return _fused_group_norm_impl(
        x, scale, bias, num_groups, eps, act, interpret, psum_axis, add=add
    )


def _gn_fwd(x, scale, bias, num_groups, eps, act, interpret, psum_axis, add=None):
    return _fused_group_norm_impl(
        x, scale, bias, num_groups, eps, act, interpret, psum_axis, add=add
    ), (x, scale, bias, add)


def _gn_bwd(num_groups, eps, act, interpret, psum_axis, res, ct):
    x, scale, bias, add = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_, a_: _ref_group_norm(
            x_, s_, b_, num_groups, eps, act, psum_axis, a_
        ),
        x, scale, bias, add,
    )
    return vjp(ct)


fused_group_norm.defvjp(_gn_fwd, _gn_bwd)


def addend_foldable(x: jax.Array, add: jax.Array) -> bool:
    """Whether `add` can ride fused_group_norm's in-kernel addend fold:
    per-sample (N, C) always folds (row padding is masked after the add);
    per-frame (N, F, C) needs a sublane-aligned row-block divisor of the
    per-frame row count so no block straddles a frame boundary."""
    if add.shape[0] != x.shape[0] or add.shape[-1] != x.shape[-1]:
        return False
    if add.ndim == 2:
        return True
    if add.ndim != 3 or x.ndim < 3 or add.shape[1] != x.shape[1]:
        return False
    c = x.shape[-1]
    s = math.prod(x.shape[1:-1])
    cap = max(8, ((1 << 18) // c) & ~7)
    return _largest_divisor(s // add.shape[1], cap) % 8 == 0


def fused_group_norm_applicable(x: jax.Array, num_groups: int) -> bool:
    """Dispatch gate — ON by default on TPU (POSETRAJ_FUSED_GROUPNORM=0
    disables).

    Speed: in ISOLATION (default layouts) XLA's groupnorm fusion wins
    (in-graph L0: 1.01 vs 1.71 ms). IN THE MODEL it loses badly: between
    convs XLA lays activations out conv-preferred ({3,0,2,1} — batch in the
    sublane dim) and the stat-reduce fusions cross that tiling at 3.5-11.9 ms
    per L0 groupnorm (full-step device trace); forcing the Pallas kernels
    (whose custom calls constrain operands to default layouts — one cheap
    copy) cut the flagship denoise step by ~150 ms.

    Memory: at VAE-decoder production shapes (e.g. (7, 576, 1024, 256))
    XLA materializes the fp32-widened normalize chain as multi-GB HLO temps
    and the 576x1024 decode OOMs 15.75G HBM; the Pallas kernels touch only
    row blocks, so giant activations must dispatch here regardless.
    """
    from posetraj_tpu.configs import kernel_config

    if jax.default_backend() != "tpu":
        return False
    c = x.shape[-1]
    if c % num_groups != 0 or c % 8 != 0:
        return False
    if math.prod(x.shape[1:-1]) < 64:
        return False
    if not kernel_config().fused_groupnorm:
        # Giant activations (VAE decode at production res) dispatch anyway:
        # the XLA path cannot fit in HBM there.
        return math.prod(x.shape) >= (1 << 28)
    return True


# ---------------------------------------------------------------------------
# LayerNorm (row-wise): single-pass kernel
# ---------------------------------------------------------------------------


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (bm, C) — full rows per block
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """(..., C) LayerNorm in ONE read+write pass: rows are complete inside
    each (bm, C) block, so stats, normalize, and affine all happen in VMEM.
    XLA's lowering runs separate fp32 stat-reduction + normalize fusions
    (convert_reduce chains = ~3 passes with fp32-widened temps); per the
    full-step device trace those chains are ~260 ms of the denoise step."""
    orig_shape = x.shape
    c = x.shape[-1]
    xf = x.reshape(-1, c)
    m = xf.shape[0]
    bm = max(8, min(1024, ((1 << 18) // c) & ~7))  # sublane dim: multiple of 8
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, c), bias.reshape(1, c))
    return out[:m].reshape(orig_shape)


def fused_layer_norm_applicable(x: jax.Array) -> bool:
    """Dispatch gate — OFF by default: in-graph on v5e the single-pass kernel
    ran 1.96 ms vs XLA's 0.97 ms at the L0 shape (28,9216,320) — XLA's LN
    fusion chain is already ~2 bandwidth-bound passes and the kernel loses
    lanes to the C=320 padding. Kept (with parity tests) for experiments via
    POSETRAJ_FUSED_LN=1 / KernelConfig(fused_ln=True); the LN fusion that
    DOES pay is folding LN into the consumer matmul
    (see pallas_mlp.fused_ln_geglu_mlp)."""
    from posetraj_tpu.configs import kernel_config

    if not kernel_config().fused_ln:
        return False
    if jax.default_backend() != "tpu":
        return False
    c = x.shape[-1]
    m = math.prod(x.shape[:-1])
    # Lane dim need not be a 128 multiple (Mosaic masks the padded lanes in
    # the row reductions — verified vs XLA on-device at C=320).
    return c % 8 == 0 and c <= 2048 and m >= 4096
