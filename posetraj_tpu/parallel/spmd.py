"""SPMD context for spatially-sharded single-video serving.

The north-star serving config (BASELINE.md: one 14-frame 576x1024 video in
<10 s on v5e-8) cannot use batch sharding — there is only one video. Instead
the denoise step shards over a ("cfg", "sp") mesh:

  * "cfg"  — the classifier-free-guidance pair: the uncond / cond UNet+
    ControlNet branches run on disjoint chips; the guidance combine is one
    tiny psum per step (see parallel/serve.py).
  * "sp"   — spatial blocks along the latent **W** axis. W is chosen over H
    because the flagship ladder divides cleanly under it at every UNet level
    (W: 128→64→32→16 vs H: 72→36→18→9 — 9 cannot split evenly).

Under W-sharding the model graph needs exactly three kinds of communication,
all provided here and consumed by ops/primitives.py + ops/attention.py via a
trace-time context (`spatial_sharding(ctx)`):

  1. 3x3 convs: a 1-column halo exchange along W (`halo_exchange_w`), after
     which the conv runs VALID along W. Edge shards receive zeros from
     `ppermute`'s missing-peer semantics — exactly conv zero-padding.
  2. GroupNorm: per-(sample, group) partial [sum, sumsq] are psum'd over
     "sp" (spatial statistics span the full H*W extent).
  3. Spatial self-attention: K/V all-gather over "sp"; queries stay local so
     each chip computes S/n_sp query rows of flash attention against the full
     token extent. (Softmax over K is permutation-invariant, so gather order
     does not matter. Cross-attention context — the length-1 CLIP embedding —
     is replicated and needs no gather.)

Everything else in the SVD graph is local under this layout: temporal
(3,1,1) convs and frame-axis attention act per pixel, LayerNorms act per
channel row, and 1x1 zero-convs have no spatial extent.

The context is a trace-time constant: it is only ever set around code being
traced inside a `jax.shard_map` body (parallel/serve.py), so the collectives
always have their mesh axes in scope. The unsharded paths are untouched when
no context is active. Reference equivalent: none — the reference's only
distributed mode is DDP over videos (SURVEY.md 2.12/5.8); this layout is the
build's own TPU-native serving design (PERF.md roadmap #4).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class SpmdCtx:
    """Active sharding layout for the model graph being traced.

    sp_axis/sp_size: mesh axis name/size sharding the spatial W dimension.
    cfg_axis/cfg_size: mesh axis name/size sharding the CFG (2B) batch dim.
    Either size may be 1 (degenerate axis), which makes every collective a
    no-op with identical numerics — the same code path runs on a single chip.

    replicated_h / replicated_s: UNet levels that run REPLICATED (full W on
    every sp shard) because their width ladder stops dividing — the reference
    eval resolution 320x576 has latent W 72 -> 36 -> 18 -> 9, where 9 cannot
    split over sp=2 (run_inference_vipseg_json_repro.py:451 is the config
    this exists for). serve.py computes the boundary from the ladder; the
    downsampler into the first replicated level all-gathers W and the
    matching upsampler re-scatters (ops/primitives.py). Ops gate their
    collectives on these trace-time shape keys:
      replicated_h — H extents (x.shape[-3]) of replicated levels, consumed
        by convs / GroupNorm / the Q7 context remap;
      replicated_s — token counts (H*W_global) of replicated levels, consumed
        by spatial self-attention's K/V gather (the flattened (B*F, S, C)
        tensor no longer carries H). serve.py asserts these keys collide with
        no sharded-level extent before building the context.
    Both default empty: every level sharded, the pre-existing behavior.
    """

    sp_axis: str = "sp"
    sp_size: int = 4
    cfg_axis: str = "cfg"
    cfg_size: int = 2
    replicated_h: frozenset = frozenset()
    replicated_s: frozenset = frozenset()

    @property
    def sharded_w(self) -> bool:
        return self.sp_size > 1

    def w_sharded_at(self, h: int) -> bool:
        """Is the W axis of a spatial tensor with H extent `h` sharded?"""
        return self.sp_size > 1 and h not in self.replicated_h

    def tokens_sharded(self, s: int) -> bool:
        """Is the token axis of a flattened (B*F, S, C) tensor a W shard?"""
        return self.sp_size > 1 and s not in self.replicated_s


_STACK: list = []


@contextlib.contextmanager
def spatial_sharding(ctx: Optional[SpmdCtx]):
    """Activate `ctx` for model code traced inside this block."""
    _STACK.append(ctx)
    try:
        yield ctx
    finally:
        _STACK.pop()


@contextlib.contextmanager
def local_tokens():
    """Suspend the spatial context: inside this block, ops treat their token
    axes as fully local (used where the 'spatial' axis of a tensor is really
    a frame axis, e.g. the temp hint-encoder's frame transformer)."""
    _STACK.append(None)
    try:
        yield
    finally:
        _STACK.pop()


def current() -> Optional[SpmdCtx]:
    return _STACK[-1] if _STACK else None


# ---------------------------------------------------------------------------
# Collectives
# ---------------------------------------------------------------------------


def halo_exchange_w(x: jax.Array, left: int, right: int, ctx: SpmdCtx) -> jax.Array:
    """Concatenate `left` columns from the left neighbor and `right` columns
    from the right neighbor along axis -2 (the W axis of (..., H, W, C)).

    Edge shards have no neighbor on that side; `lax.ppermute` delivers zeros
    to unaddressed receivers, which is exactly the zero-padding a conv edge
    needs — no special-casing.
    """
    n = ctx.sp_size
    parts = []
    if left:
        # shard i receives shard i-1's rightmost `left` columns
        src = lax.slice_in_dim(x, x.shape[-2] - left, x.shape[-2], axis=-2)
        parts.append(lax.ppermute(src, ctx.sp_axis, [(i, i + 1) for i in range(n - 1)]))
    parts.append(x)
    if right:
        src = lax.slice_in_dim(x, 0, right, axis=-2)
        parts.append(lax.ppermute(src, ctx.sp_axis, [(i + 1, i) for i in range(n - 1)]))
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=-2)


def psum_spatial(x: jax.Array, ctx: SpmdCtx) -> jax.Array:
    """Sum partial spatial statistics over the W-shard axis."""
    if ctx.sp_size == 1:
        return x
    return lax.psum(x, ctx.sp_axis)


def all_gather_tokens(x: jax.Array, ctx: SpmdCtx, axis: int = 1) -> jax.Array:
    """All-gather a token-sharded tensor along `axis` over the W-shard axis
    (used for attention K/V: (B, S_local, C) -> (B, S_global, C))."""
    if ctx.sp_size == 1:
        return x
    return lax.all_gather(x, ctx.sp_axis, axis=axis, tiled=True)


def gather_w(x: jax.Array, ctx: SpmdCtx) -> jax.Array:
    """All-gather the W shard axis (axis -2 of (..., H, W, C)) so every sp
    shard holds the full width — the entry into a replicated deep level."""
    if ctx.sp_size == 1:
        return x
    return lax.all_gather(x, ctx.sp_axis, axis=x.ndim - 2, tiled=True)


def scatter_w(x: jax.Array, ctx: SpmdCtx) -> jax.Array:
    """Slice this shard's local W block out of a replicated full-width tensor
    — the exit from a replicated deep level back into W-sharded levels."""
    if ctx.sp_size == 1:
        return x
    w_loc = x.shape[-2] // ctx.sp_size
    idx = lax.axis_index(ctx.sp_axis)
    return lax.dynamic_slice_in_dim(x, idx * w_loc, w_loc, axis=x.ndim - 2)


def conv_halo_plan(kw: int, stride: int, pad_w: tuple) -> tuple:
    """(halo_left, halo_right) so that a W-VALID conv over the haloed local
    block reproduces the global conv's local output shard.

    Derivation: global output column o reads inputs [o*stride - pl,
    o*stride - pl + kw - 1]. A shard owning local outputs [0, W_loc/stride)
    at global offset O = shard*W_loc (W_loc divisible by stride) therefore
    needs inputs [O - pl, O + W_loc - stride + kw - 1 - pl], i.e. `pl` extra
    columns on the left and (kw - 1 - pl - (stride - 1)) on the right.
    """
    pl_, pr_ = pad_w
    halo_l = pl_
    halo_r = kw - 1 - pl_ - (stride - 1)
    if halo_r < 0:
        raise ValueError(f"unsupported conv geometry kw={kw} stride={stride} pad={pad_w}")
    return halo_l, halo_r
