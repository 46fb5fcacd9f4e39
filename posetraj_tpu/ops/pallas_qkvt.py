"""Transposed-packed spatial self-attention sub-layer (3 Pallas kernels).

The round-2 device trace put ~130 ms/step in pure layout copies and a large
slice of the ~450 ms "remaining XLA fusions" bucket in the attention
projections: the natural (B, S, 3C) QKV projection output must be split,
head-folded and transposed into the (B*N, H, S) operand layouts the tq flash
kernel wants — ~6 HBM round-trips of layout traffic per attention at L0
(165 MB each). The fix is to never produce the natural layout at all:

  kernel 1  ln_qkvt_proj   x (B, S, C) -> qkv_t (B, 3C, S)
            LayerNorm prologue (full rows per block, stats free in VMEM) and
            the fused-QKV matmul computed with TRANSPOSED output:
            qkv_t[d, s] = sum_c Wt[d, c] * h[s, c] — both operands natural,
            output written directly in the kernel layout.
  kernel 2  _qkvt_attn      per-(batch, head, q-block) flash attention whose
            BlockSpec index maps slice 64-row per-head tiles off the packed
            3C axis (head n: q rows [nH,(n+1)H), k at C+nH, v at 2C+nH).
            Mosaic's lane-dim rule (last block dim multiple of 128 or the
            full axis) forbids 64-lane per-head blocks on a (B, S, 3C)
            array — on the SUBLANE axis the granularity is 8/16 rows, so the
            transposed layout makes per-head slicing legal. All three
            operands arrive pre-transposed; the (H, bq) accumulator IS the
            output layout (the tq trick with zero transposes anywhere).
  kernel 3  out_proj_res    o_t (B, C, S) -> (B, S, C):
            y[s, c'] = x[s, c'] + sum_c o_t[c, s] * Wo[c, c'] + bo[c'] —
            the to_out projection transposes BACK to natural as a free
            by-product of the contraction, with the residual add fused.

Gradients: the sub-layer is one custom_vjp whose backward recomputes through
the existing formulation (layer_norm + fused QKV matmul + flash_attention_diff
with its blockwise Pallas backward) — identical math, and the training path's
per-block jax.checkpoint recomputes forward activations anyway.

Replaces the torch norm1->to_qkv->SDPA->to_out sub-layer of the reference
(diffusers BasicTransformerBlock; consumed at train_svd_traj_blender_14.py:
925-937 via xformers SDPA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block_s(s: int) -> int:
    """Largest 128-aligned divisor of S up to 512 (keeps each program's fp32
    accumulator inside scoped VMEM at every model width); small sequences run
    as one full-axis block."""
    for bs in (512, 384, 256, 128):
        if s % bs == 0:
            return bs
    return s  # e.g. 576: full-axis block (legal; small enough at any width)


# ---------------------------------------------------------------------------
# Kernel 1: LayerNorm + QKV projection with transposed output
# ---------------------------------------------------------------------------


def _ln_qkvt_kernel(x_ref, wt_ref, lns_ref, lnb_ref, o_ref, *, eps: float):
    """One (batch, s-block, d-block) program.
    x_ref (1, bs, C); wt_ref (bd, C); o_ref (1, bd, bs)."""
    xf = x_ref[0].astype(jnp.float32)                      # (bs, C)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    h = xn.astype(o_ref.dtype)                              # (bs, C)
    # qkv_t[d, s] = Wt[d, :] . h[s, :] — contraction over C, output (bd, bs)
    o_ref[0] = jax.lax.dot_general(
        wt_ref[...], h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_s", "interpret"))
def ln_qkvt_proj(x, wt, ln_s, ln_b, eps: float = 1e-5, block_s: int = 0,
                 interpret: bool | None = None):
    """x (B, S, C), wt (3C, C) [rows q|k|v] -> qkv_t (B, 3C, S) =
    Wt @ layer_norm(x)^T, with no transpose materialized anywhere."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, c = x.shape
    d3 = wt.shape[0]
    if block_s == 0:
        block_s = _pick_block_s(s)
    # d-blocks: full for narrow models; the wide L2 (3C=3840, C=1280) splits
    # so double-buffered Wt/out blocks + the fp32 accumulator stay inside
    # scoped VMEM (block_d=1280 measured 18.2M > the 16M limit at S=576).
    block_d = d3 if c <= 640 else 640
    while d3 % block_d != 0:  # static, tiny
        block_d //= 2
    assert s % block_s == 0 and d3 % block_d == 0, (s, block_s, d3, block_d)

    grid = (b, s // block_s, d3 // block_d)
    out = pl.pallas_call(
        functools.partial(_ln_qkvt_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, c), lambda bi, si, di: (bi, si, 0)),
            pl.BlockSpec((block_d, c), lambda bi, si, di: (di, 0)),
            pl.BlockSpec((1, c), lambda bi, si, di: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, si, di: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_d, block_s), lambda bi, si, di: (bi, di, si)),
        out_shape=jax.ShapeDtypeStruct((b, d3, s), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x, wt, ln_s.reshape(1, c), ln_b.reshape(1, c))
    return out


# ---------------------------------------------------------------------------
# Kernel 2: flash attention on the transposed-packed layout
# ---------------------------------------------------------------------------


def _qkvt_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int,
                      no_max: bool = False):
    """One (batch, head, q-block) program, ALL refs transposed per-head:
    q_ref (1, H, bq); k_ref/v_ref (1, H, S); o_ref (1, H, bq).
    exp2 softmax with log2(e) folded into the q scale (see _flash_kernel_tq).

    The softmax denominator rides the MXU: a ones-row appended to the V block
    makes the PV contraction emit sum_k(p) as an extra accumulator row —
    the sublane pad 64->128 means those rows are FREE MXU work, and the
    per-block VPU pass that summed p over 8 sublanes disappears (the VPU
    softmax is this kernel's bottleneck: ~86 TF/s = 43% of bf16 peak with
    max+exp2+sum; dropping the sum pass cuts per-logit VPU work by ~1/3).
    The l row also inherits the online alpha-rescale from the accumulator."""
    q_t = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    head_dim, block_q = q_t.shape
    s_len = k_ref.shape[2]
    num_kb = s_len // block_k

    def aug(v):  # (H, bk) -> (H+8, bk): 8 ones-rows (sublane granularity)
        return jnp.concatenate([v, jnp.ones((8, v.shape[1]), v.dtype)], axis=0)

    # no_max: in base 2, subtracting the row max rescales p/l/acc by the SAME
    # power of two — exact in binary floating point, so the division cancels
    # it bit-for-bit. Skipping it deletes the max pass AND the serial online
    # alpha-rescale chain between K blocks (each block becomes an independent
    # exp2 + MXU accumulate, which Mosaic pipelines freely). Logits are
    # clamped at 80 in the log2 domain (natural logit ~55 — attention at that
    # sharpness is a one-hot; the clamp preserves exactness below it) so p
    # stays <= 2^80 and the f32 accumulator (< S * 2^80 * |V| ~ 2^95) cannot
    # overflow. KernelConfig.attn_no_max gates this at dispatch.
    _CLAMP = 80.0

    if num_kb == 1:
        # Single-block: exact softmax. no_max measured SLOWER here (0.59 ->
        # 0.79 ms at S=576 — the min clamp fuses worse than the max+sub it
        # replaces, and there is no alpha chain to delete), so it only
        # applies to the multi-block path below.
        s = jax.lax.dot_general(
            k_ref[0], q_t, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (S, bq)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp2(s - m).astype(v_ref.dtype)
        acc = jax.lax.dot_general(
            aug(v_ref[0]), p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H+8, bq); row H is l = sum_k p
        o_ref[0] = (acc[:head_dim] / jnp.maximum(acc[head_dim : head_dim + 1], 1e-30)
                    ).astype(o_ref.dtype)
        return

    def logits(j):
        k_blk = k_ref[0, :, pl.ds(j * block_k, block_k)]   # (H, bk)
        return jax.lax.dot_general(
            k_blk, q_t, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bk, bq)

    def pv(j, p):
        v_blk = v_ref[0, :, pl.ds(j * block_k, block_k)]   # (H, bk)
        return jax.lax.dot_general(
            aug(v_blk), p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H+8, bq): contraction over block_k at full MXU width; row H = l

    if no_max:
        acc = jnp.zeros((head_dim + 8, block_q), jnp.float32)
        for j in range(num_kb):  # trace-time unroll; blocks fully independent
            p = jnp.exp2(jnp.minimum(logits(j), _CLAMP)).astype(v_ref.dtype)
            acc = acc + pv(j, p)
        o_ref[0] = (acc[:head_dim] / jnp.maximum(acc[head_dim : head_dim + 1], 1e-30)
                    ).astype(o_ref.dtype)
        return

    # Statically-unrolled STAGGERED K loop (num_kb <= 9 at every SVD shape):
    # block j+1's logits matmul carries no dependency on block j's softmax
    # chain, so emitting it before the VPU work of block j lets Mosaic overlap
    # MXU and VPU — the two are near-parity here (logits 268 MF vs ~3 VPU ops
    # per logit), which is exactly why the sequential fori_loop version sat at
    # ~43% of MXU peak. A fori_loop stagger was measured SLOWER (the (bk, bq)
    # fp32 carry materializes every iteration, PERF.md); unrolling keeps s_next
    # a register-allocated temp with no carry copies.
    m = jnp.full((1, block_q), NEG_INF, jnp.float32)
    acc = jnp.zeros((head_dim + 8, block_q), jnp.float32)
    s_cur = logits(0)
    for j in range(num_kb):  # trace-time unroll
        s_next = logits(j + 1) if j + 1 < num_kb else None
        m_new = jnp.maximum(m, jnp.max(s_cur, axis=0, keepdims=True))
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s_cur - m_new).astype(v_ref.dtype)
        acc = acc * alpha + pv(j, p)
        m = m_new
        s_cur = s_next
    o_ref[0] = (acc[:head_dim] / jnp.maximum(acc[head_dim : head_dim + 1], 1e-30)
                ).astype(o_ref.dtype)


def qkvt_blocks(s: int):
    """(block_q, block_k) for the transposed-packed kernel, or None when S
    doesn't tile (caller falls back to the split-operand path; no padding —
    the packed layout can't pad per-head segments independently). Lane-dim
    blocks must be multiples of 128 or the full axis."""
    if s >= 4096:
        # (1024, 1024) per the v5e in-graph sweep (same optimum as the tq
        # kernel's long-sequence config; fp32 logits 4 MB).
        if s % 1024 == 0:
            return 1024, 1024
        if s % 512 == 0:
            return 512, 512
        return None
    if s <= 1024:
        return s, s  # single q/k block, exact softmax
    # Mid-range: whole K extent as one block; q block sized so the fp32
    # (S, bq) logits stay inside scoped VMEM, lane-aligned to 128.
    bq_cap = (11_000_000 // (4 * s)) // 128 * 128
    for bq in range(min(bq_cap, s), 0, -128):
        if s % bq == 0:
            return bq, s
    return None


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret", "no_max"))
def qkvt_attention(qkv_t, num_heads: int, scale: float, interpret: bool | None = None,
                   no_max: bool = False):
    """qkv_t (B, 3C, S) [row-blocks q|k|v, each C = num_heads * H] ->
    o_t (B, C, S). Per-head tiles are sliced by BlockSpec index maps on the
    sublane axis; nothing is ever transposed."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d3, s = qkv_t.shape
    c = d3 // 3
    h = c // num_heads
    n = num_heads
    blocks = qkvt_blocks(s)
    assert blocks is not None, f"no block config tiles S={s}"
    block_q, block_k = blocks

    grid = (b, n, s // block_q)
    out = pl.pallas_call(
        functools.partial(_qkvt_attn_kernel, scale=scale, block_k=block_k,
                          no_max=no_max),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, block_q), lambda bi, ni, qi: (bi, ni, qi)),
            pl.BlockSpec((1, h, s), lambda bi, ni, qi: (bi, n + ni, 0)),
            pl.BlockSpec((1, h, s), lambda bi, ni, qi: (bi, 2 * n + ni, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, block_q), lambda bi, ni, qi: (bi, ni, qi)),
        out_shape=jax.ShapeDtypeStruct((b, c, s), qkv_t.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
        interpret=interpret,
    )(qkv_t, qkv_t, qkv_t)
    return out


# ---------------------------------------------------------------------------
# Kernel 3: out-projection back to natural layout + residual
# ---------------------------------------------------------------------------


def _out_proj_kernel(ot_ref, wo_ref, bo_ref, res_ref, o_ref):
    """One (batch, s-block) program: o_ref (1, bs, C') =
    res + o_t^T @ Wo + bo, the transpose free in the contraction.
    ot_ref (1, C, bs); wo_ref (C, C'); res_ref (1, bs, C')."""
    y = jax.lax.dot_general(
        ot_ref[0], wo_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bs, C')
    y = y + bo_ref[...].astype(jnp.float32) + res_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def out_proj_res(o_t, wo, bo, res, block_s: int = 0, interpret: bool | None = None):
    """o_t (B, C, S), wo (C, C'), bo (C',), res (B, S, C') ->
    (B, S, C') = res + o_t^T @ wo + bo."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, c, s = o_t.shape
    c_out = wo.shape[1]
    if block_s == 0:
        block_s = _pick_block_s(s)
    assert s % block_s == 0, (s, block_s)
    grid = (b, s // block_s)
    out = pl.pallas_call(
        _out_proj_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, block_s), lambda bi, si: (bi, 0, si)),
            pl.BlockSpec((c, c_out), lambda bi, si: (0, 0)),
            pl.BlockSpec((1, c_out), lambda bi, si: (0, 0)),
            pl.BlockSpec((1, block_s, c_out), lambda bi, si: (bi, si, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, c_out), lambda bi, si: (bi, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c_out), res.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(o_t, wo, bo.reshape(1, c_out), res)
    return out


# ---------------------------------------------------------------------------
# The fused sub-layer: x + to_out(attn(LN(x))) with exact XLA-path gradients
# ---------------------------------------------------------------------------


def _ref_attn_sublayer(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps):
    """The existing formulation of the same sub-layer (layer_norm + fused QKV
    matmul + dispatched attention + out proj), used for gradients. Imports
    stay local: ops.attention dispatches back into Pallas flash kernels on
    TPU (flash_attention_diff has its own blockwise Pallas backward), so even
    the recomputed backward never materializes S^2 logits."""
    from posetraj_tpu.ops.attention import attention
    from posetraj_tpu.ops.primitives import layer_norm

    h = layer_norm({"scale": ln_s, "bias": ln_b}, x, eps=eps).astype(x.dtype)
    qkv = jnp.dot(h, wqkv.astype(x.dtype), preferred_element_type=x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = attention(q, k, v, num_heads)
    return x + jnp.dot(out, wo.astype(x.dtype), preferred_element_type=x.dtype) \
        + bo.astype(x.dtype)


def _fused_impl(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps):
    from posetraj_tpu.configs import kernel_config

    wt = wqkv.astype(x.dtype).T  # (3C, C); loop-invariant, hoisted by XLA
    qkv_t = ln_qkvt_proj(x, wt, ln_s, ln_b, eps=eps)
    c = wqkv.shape[0]
    o_t = qkvt_attention(qkv_t, num_heads, (c // num_heads) ** -0.5,
                         no_max=kernel_config().attn_no_max)
    return out_proj_res(o_t, wo.astype(x.dtype), bo.astype(x.dtype), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def attn_sublayer(x, ln_s, ln_b, wqkv, wo, bo, num_heads: int, eps: float = 1e-5):
    """x (B, S, C) -> x + to_out(self_attention(layer_norm(x))): the full
    pre-norm spatial self-attention sub-layer in three transposed-packed
    Pallas kernels (zero HBM layout traffic). wqkv (C, 3C) = [Wq|Wk|Wv]."""
    return _fused_impl(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps)


def _asl_fwd(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps):
    return _fused_impl(x, ln_s, ln_b, wqkv, wo, bo, num_heads, eps), (
        x, ln_s, ln_b, wqkv, wo, bo)


def _asl_bwd(num_heads, eps, res, ct):
    _, vjp = jax.vjp(lambda *a: _ref_attn_sublayer(*a, num_heads, eps), *res)
    return vjp(ct)


attn_sublayer.defvjp(_asl_fwd, _asl_bwd)


def attn_sublayer_applicable(x, num_heads: int) -> bool:
    """TPU-only; S must tile the packed kernels (no padding possible in the
    packed layout) and head_dim must hit the 64-row sublane granularity."""
    from posetraj_tpu.configs import kernel_config

    if not kernel_config().qkvt_attn:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, s, c = x.shape
    h = c // num_heads
    if h % 16 != 0 or c % num_heads != 0:
        return False
    if s < 512 or qkvt_blocks(s) is None:
        return False
    return s % 128 == 0 or s <= 1024
