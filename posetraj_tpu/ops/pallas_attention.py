"""Pallas TPU flash attention for the SVD spatial-token hot path.

The UNet/ControlNet spend their attention FLOPs in two very different shapes
(SURVEY.md 3.4): spatial self-attention over h*w tokens (720..9216, head_dim
64 at every level: 320/5, 640/10, 1280/20) and temporal attention over 14
frame-tokens with huge batch. This kernel targets the spatial shape: online-
softmax (flash) over K/V blocks so VMEM stays bounded at any sequence length;
the tiny-seq temporal shape stays on the XLA path where a flash decomposition
would only add overhead (ops/attention.py dispatch).

Replaces the torch/xformers SDPA the reference relies on
(train_svd_traj_blender_14.py:925-937).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, s_len: int):
    """One (batch*head, q-block) program: online softmax over K/V blocks.

    q_ref: (1, block_q, H); k_ref/v_ref: (1, S_pad, H); o_ref: (1, block_q, H).

    MXU precision: both matmuls take bf16 (or the input dtype) operands with
    fp32 accumulation — upcasting operands to fp32 would silently put the MXU
    in quarter-rate fp32 mode. Softmax statistics (m, l) and the output
    accumulator stay fp32, matching the reference's fp32-softmax SDPA
    numerics (train...blender_14.py:925-937 via xformers).
    """
    # Fold the scale into q in fp32 (before the bf16 round) so logits match
    # the scale-then-matmul order of torch SDPA.
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (bq, H)
    block_q, head_dim = q.shape
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k
    needs_mask = s_len != s_pad  # static: no padded K columns -> no masking VPU work

    if num_kb == 1:
        # Single-block fast path: exact softmax, no online-rescale VPU work.
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if needs_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < s_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    def body(j, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]  # (bk, H) input dtype
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk) fp32
        if needs_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            s = jnp.where(col < s_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_kernel_tq(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, s_len: int,
                     no_max: bool = False):
    """Transposed-accumulator variant: one (batch*head, q-block) program.

    Head_dim 64 puts BOTH matmuls of the natural layout at 50% MXU
    utilization (QK^T contracts over 64; PV's output dim is 64). Computing the
    kernel transposed fixes the PV half: S^T = K @ Q^T still contracts over
    head_dim (50%), but acc^T = V^T @ P^T contracts over block_k with block_q
    output lanes — full MXU width. Ceiling moves from ~1/2 to ~2/3 of peak.

    Layouts (pre-transposed OUTSIDE the kernel by XLA, where the transpose
    fuses into the surrounding reshape): q_ref (1, H, block_q);
    k_ref (1, S_pad, H) natural; v_ref (1, H, S_pad); o_ref (1, H, block_q).

    Softmax runs in base 2 with log2(e) folded into the q scaling:
    exp2((x*scale*log2e) - m2) == exp(x*scale - m) exactly (m2 tracked in the
    scaled domain), and the VPU's exp lowers to exp2+multiply — pre-folding
    deletes one multiply per logit from the kernel's dominant VPU cost.
    """
    q_t = (q_ref[0].astype(jnp.float32) * (scale * 1.4426950408889634)).astype(q_ref.dtype)
    head_dim, block_q = q_t.shape
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k
    needs_mask = s_len != s_pad

    # Softmax denominator on the MXU: 8 ones-rows appended to the V block make
    # the PV contraction emit sum_k(p) as extra accumulator rows — free work
    # inside the 64->128 sublane pad — deleting the per-block VPU sum pass
    # over the logits (the VPU softmax is this kernel's bottleneck).
    def aug(v):  # (H, bk) -> (H+8, bk)
        return jnp.concatenate([v, jnp.ones((8, v.shape[1]), v.dtype)], axis=0)

    if num_kb == 1:
        s = jax.lax.dot_general(
            k_ref[0], q_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (S_pad, bq)
        if needs_mask:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(row < s_len, s, NEG_INF)
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
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]  # (bk, H)
        s = jax.lax.dot_general(
            k_blk, q_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bk, bq)
        if needs_mask:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * block_k
            s = jnp.where(row < s_len, s, NEG_INF)
        return s

    def pv(j, p):
        v_blk = v_ref[0, :, pl.ds(j * block_k, block_k)]  # (H, bk)
        return jax.lax.dot_general(
            aug(v_blk), p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H+8, bq): contraction over block_k at full MXU width; row H = l

    # Statically-unrolled STAGGERED K loop (see pallas_qkvt._qkvt_attn_kernel):
    # block j+1's logits matmul is independent of block j's softmax chain, so
    # Mosaic overlaps MXU and VPU. A fori_loop stagger was measured SLOWER
    # (35.5 -> 58.0 ms at L0: the (bk, bq) fp32 carry materializes every
    # iteration); trace-time unrolling keeps the staged logits a VMEM temp.
    # Measured on the packed twin: L0 chain 37.9 -> 30.2 ms.
    m = jnp.full((1, block_q), NEG_INF, jnp.float32)
    acc = jnp.zeros((head_dim + 8, block_q), jnp.float32)
    s_cur = logits(0)
    for j in range(num_kb):  # trace-time unroll (num_kb <= 9 at SVD shapes)
        s_next = logits(j + 1) if j + 1 < num_kb else None
        m_new = jnp.maximum(m, jnp.max(s_cur, axis=0, keepdims=True))  # (1, bq)
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s_cur - m_new).astype(v_ref.dtype)
        acc = acc * alpha + pv(j, p)
        m = m_new
        s_cur = s_next
    o_ref[0] = (acc[:head_dim] / jnp.maximum(acc[head_dim : head_dim + 1], 1e-30)
                ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention_tq(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Transposed-accumulator flash attention over (B, Sq, N, H) q and
    (B, Skv, N, H) k/v — same contract as flash_attention, faster at head_dim
    64 (see _flash_kernel_tq). Sq and Skv may differ (W-sharded serving
    gathers K/V over the shard axis, so Skv = n_shards * Sq there)."""
    b, s, n, h = q.shape
    skv = k.shape[1]

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * n, x.shape[1], h)

    qf, kf, vf = fold(q), fold(k), fold(v)

    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(s, block_q)
    sk_pad = _round_up(skv, block_k)
    if sq_pad != s:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - s), (0, 0)))
    if sk_pad != skv:
        pad = ((0, 0), (0, sk_pad - skv), (0, 0))
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)

    q_t = qf.transpose(0, 2, 1)  # (B*N, H, Sq_pad)
    v_t = vf.transpose(0, 2, 1)  # (B*N, H, Sk_pad)

    grid = (b * n, sq_pad // block_q)
    kernel = functools.partial(_flash_kernel_tq, scale=scale, block_k=block_k, s_len=skv)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, block_q), lambda bi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, sk_pad, h), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, h, sk_pad), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, block_q), lambda bi, qi: (bi, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((b * n, h, sq_pad), q.dtype),
        interpret=interpret,
    )(q_t, kf, v_t)

    out = out.transpose(0, 2, 1)[:, :s, :].reshape(b, n, s, h).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Attention over (B, Sq, N, H) q and (B, Skv, N, H) k/v.

    Returns (B, Sq, N, H) in q.dtype. Sequences are padded to the block grid;
    padded K columns are masked inside the kernel, padded Q rows sliced off.
    """
    b, s, n, h = q.shape
    skv = k.shape[1]
    # Fold heads into batch; kernel operates on (B*N, S, H).
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * n, x.shape[1], h)

    qf, kf, vf = fold(q), fold(k), fold(v)

    # Q rows and K/V columns are padded independently: Q to the q-block grid,
    # K/V to the k-block grid. (Padding both to max(bq, bk) would leave the
    # final q rows unwritten whenever that multiple isn't divisible by
    # block_q, e.g. S=576 with bq=512.)
    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(s, block_q)
    sk_pad = _round_up(skv, block_k)
    if sq_pad != s:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - s), (0, 0)))
    if sk_pad != skv:
        pad = ((0, 0), (0, sk_pad - skv), (0, 0))
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)

    grid = (b * n, sq_pad // block_q)
    kernel = functools.partial(_flash_kernel, scale=scale, block_k=block_k, s_len=skv)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, h), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, sk_pad, h), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, sk_pad, h), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, h), lambda bi, qi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, sq_pad, h), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :s, :].reshape(b, n, s, h).transpose(0, 2, 1, 3)
    return out


# ---------------------------------------------------------------------------
# Differentiable flash attention (custom_vjp with Pallas backward)
# ---------------------------------------------------------------------------
#
# The trainable ControlNet's spatial attention sits on the gradient path, and
# an XLA backward would materialize the (fold, S, S) fp32 logits (47 GB at
# S=9216) just like the XLA forward. Standard flash backward instead: the
# forward also emits the per-row log-sum-exp (base-2 domain, matching the
# exp2 softmax), and the backward recomputes probabilities blockwise in two
# kernels — dq over q-blocks, dk/dv over k-blocks.

_LOG2E = 1.4426950408889634


def _flash_kernel_tq_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                         block_k: int, s_len: int):
    """Forward tq kernel that also writes lse (log2-sum-exp2 of the scaled
    logits) per q row — the residual the flash backward needs."""
    q_t = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    head_dim, block_q = q_t.shape
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k
    needs_mask = s_len != s_pad

    def logits(j):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            k_blk, q_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if needs_mask:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * block_k
            s = jnp.where(row < s_len, s, NEG_INF)
        return s

    # Softmax denominator on the MXU + staggered unrolled K loop, exactly as
    # _flash_kernel_tq; additionally writes lse = m + log2(l) for the flash
    # backward (l read off the ones-row of the augmented accumulator).
    def aug(v):  # (H, bk) -> (H+8, bk)
        return jnp.concatenate([v, jnp.ones((8, v.shape[1]), v.dtype)], axis=0)

    def pv(j, p):
        v_blk = v_ref[0, :, pl.ds(j * block_k, block_k)]
        return jax.lax.dot_general(
            aug(v_blk), p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H+8, bq); row H is l = sum_k p

    if num_kb == 1:
        s = logits(0)
        m = jnp.max(s, axis=0, keepdims=True)
        acc = pv(0, jnp.exp2(s - m).astype(v_ref.dtype))
    else:
        m = jnp.full((1, block_q), NEG_INF, jnp.float32)
        acc = jnp.zeros((head_dim + 8, block_q), jnp.float32)
        s_cur = logits(0)
        for j in range(num_kb):  # trace-time unroll, staggered (see tq kernel)
            s_next = logits(j + 1) if j + 1 < num_kb else None
            m_new = jnp.maximum(m, jnp.max(s_cur, axis=0, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s_cur - m_new).astype(v_ref.dtype)
            acc = acc * alpha + pv(j, p)
            m = m_new
            s_cur = s_next
    l = acc[head_dim : head_dim + 1]
    o_ref[0] = (acc[:head_dim] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log2(jnp.maximum(l, 1e-30)))[0]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                         *, scale: float, block_k: int, s_len: int):
    """dq for one (fold, q-block): natural layouts (q/do (1,bq,H), k/v (1,S,H))."""
    c = scale * _LOG2E
    q = q_ref[0].astype(jnp.float32)          # (bq, H)
    do = do_ref[0].astype(jnp.float32)        # (bq, H)
    lse = lse_ref[0, 0].astype(jnp.float32)[:, None]    # (bq, 1)
    delta = delta_ref[0, 0].astype(jnp.float32)[:, None]
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k
    needs_mask = s_len != s_pad

    def body(j, dq):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s2 = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * c                                  # (bq, bk), log2 domain
        if needs_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + j * block_k
            s2 = jnp.where(col < s_len, s2, NEG_INF)
        p = jnp.exp2(s2 - lse)                 # (bq, bk)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                      # (bq, bk)
        ds = p * (dp - delta)                  # natural-log-domain grad of s_nat
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros_like(q))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, scale: float, block_q: int, s_len: int):
    """dk/dv for one (fold, k-block), looping over q blocks."""
    c = scale * _LOG2E
    k_blk = k_ref[0].astype(jnp.float32)       # (bk, H)
    v_blk = v_ref[0].astype(jnp.float32)       # (bk, H)
    s_pad = q_ref.shape[1]
    num_qb = s_pad // block_q
    needs_mask = s_len != s_pad

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)     # (bq, H)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)[:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)[:, None]
        s2 = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * c                                  # (bq, bk)
        if needs_mask:
            # padded q ROWS must not contribute to dk/dv
            row = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0) + i * block_q
            s2 = jnp.where(row < s_len, s2, NEG_INF)
        p = jnp.exp2(s2 - lse)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                      # (bk, H)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    z = jnp.zeros_like(k_blk)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_fwd_lse(q, k, v, scale, block_q=512, block_k=1024, interpret=False):
    b, s, n, h = q.shape
    skv = k.shape[1]

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * n, x.shape[1], h)

    qf, kf, vf = fold(q), fold(k), fold(v)
    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(s, block_q)
    sk_pad = _round_up(skv, block_k)
    if sq_pad != s:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - s), (0, 0)))
    if sk_pad != skv:
        pad = ((0, 0), (0, sk_pad - skv), (0, 0))
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    q_t = qf.transpose(0, 2, 1)
    v_t = vf.transpose(0, 2, 1)
    grid = (b * n, sq_pad // block_q)
    kernel = functools.partial(_flash_kernel_tq_lse, scale=scale, block_k=block_k, s_len=skv)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, block_q), lambda bi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, sk_pad, h), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, h, sk_pad), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, block_q), lambda bi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda bi, qi: (bi, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * n, h, sq_pad), q.dtype),
            jax.ShapeDtypeStruct((b * n, 1, sq_pad), jnp.float32),
        ],
        interpret=interpret,
    )(q_t, kf, v_t)
    out = out.transpose(0, 2, 1)[:, :s, :].reshape(b, n, s, h).transpose(0, 2, 1, 3)
    return out, lse[:, 0, :]  # lse folded+padded: (B*N, Sq_pad)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_bwd(q, k, v, out, lse, do, scale, block_q=512, block_k=512, interpret=False):
    b, s, n, h = q.shape
    skv = k.shape[1]

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * n, x.shape[1], h)

    qf, kf, vf, of, dof = fold(q), fold(k), fold(v), fold(out), fold(do)
    delta = jnp.sum(of.astype(jnp.float32) * dof.astype(jnp.float32), axis=-1)  # (B*N, Sq)

    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(skv, 128))
    # Q-side tensors pad to the q-block grid, K-side to the k-block grid;
    # each kernel loops over the OTHER side's full padded extent, masking the
    # pad (q rows in dkv, k columns in dq) to -inf logits.
    sq_pad = _round_up(s, block_q)
    sk_pad = _round_up(skv, block_k)
    padq = lambda x: jnp.pad(x, ((0, 0), (0, sq_pad - s), (0, 0))) if sq_pad != s else x
    padk = lambda x: jnp.pad(x, ((0, 0), (0, sk_pad - skv), (0, 0))) if sk_pad != skv else x
    qf, dof = padq(qf), padq(dof)
    kf, vf = padk(kf), padk(vf)
    # lse arrives padded to the FORWARD q grid, which may differ from the
    # backward padding (dispatch may pick different blocks): slice to the true
    # length first, then re-pad. Padded q rows are masked to -inf logits in
    # the dkv kernel, so the pad values never matter.
    lse = lse[:, :s]
    if lse.shape[1] != sq_pad:
        lse = jnp.pad(lse, ((0, 0), (0, sq_pad - lse.shape[1])))
    if delta.shape[1] != sq_pad:
        delta = jnp.pad(delta, ((0, 0), (0, sq_pad - delta.shape[1])))

    lse3 = lse[:, None, :]
    delta3 = delta[:, None, :]
    grid_q = (b * n, sq_pad // block_q)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, block_k=block_k, s_len=skv),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, block_q, h), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, sk_pad, h), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, sk_pad, h), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, block_q, h), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda bi, qi: (bi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, h), lambda bi, qi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, sq_pad, h), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, lse3, delta3)

    grid_k = (b * n, sk_pad // block_k)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, block_q=block_q, s_len=s),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, sq_pad, h), lambda bi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, block_k, h), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, h), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, sq_pad, h), lambda bi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, sq_pad), lambda bi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, sq_pad), lambda bi, ki: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, h), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, h), lambda bi, ki: (bi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * n, sk_pad, h), q.dtype),
            jax.ShapeDtypeStruct((b * n, sk_pad, h), q.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lse3, delta3)

    unfold_q = lambda x: x[:, :s, :].reshape(b, n, s, h).transpose(0, 2, 1, 3)
    unfold_k = lambda x: x[:, :skv, :].reshape(b, n, skv, h).transpose(0, 2, 1, 3)
    return unfold_q(dq), unfold_k(dk), unfold_k(dv)


# ---------------------------------------------------------------------------
# Packed-QKV self-attention: zero layout work outside the kernel
# ---------------------------------------------------------------------------
#
# The fused QKV projection emits (B, S, 3C) with C = heads * head_dim. The
# split into per-head (B*N, S, H) operands plus the q/v transposes the tq
# kernel wants cost ~6 HBM round-trips of pure layout traffic per attention
# (~130 ms/step in the round-2 device trace, PERF.md). Here the kernel reads
# its per-head q/k/v tiles STRAIGHT out of the projection output via BlockSpec
# index maps over the concatenated channel axis (head ni of q at column block
# ni, of k at n+ni, of v at 2n+ni), accumulates transposed in VMEM for full
# MXU width (see _flash_kernel_tq), and transposes the (H, bq) accumulator to
# the natural layout on the VMEM write-out — the surrounding graph never sees
# anything but (B, S, 3C) in and (B, S, C) out.


def _flash_kernel_qkv(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                      block_k: int, s_len: int):
    """One (batch, head, q-block) program, all refs in natural layout:
    q_ref (1, bq, H); k_ref/v_ref (1, S_pad, H); o_ref (1, bq, H);
    lse_ref (1, 1, bq) — log2-sum-exp2 residual for the flash backward."""
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)  # (bq, H)
    block_q, head_dim = q.shape
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k
    needs_mask = s_len != s_pad

    def logits(j):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]  # (bk, H)
        s = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bk, bq)
        if needs_mask:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * block_k
            s = jnp.where(row < s_len, s, NEG_INF)
        return s

    def pv(j, p):
        # acc^T += V^T P: contraction over block_k at full MXU lane width
        # (the tq trick) with v in its NATURAL (bk, H) layout — dims picked
        # via dot_general instead of a pre-transposed operand.
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]  # (bk, H)
        return jax.lax.dot_general(
            v_blk, p.astype(v_blk.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, bq)

    if num_kb == 1:
        s = logits(0)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        acc = pv(0, p)
    else:
        def body(j, carry):
            m, l, acc = carry
            s = logits(j)
            m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            return m_new, l_new, acc * alpha + pv(j, p)

        m0 = jnp.full((1, block_q), NEG_INF, jnp.float32)
        l0 = jnp.zeros((1, block_q), jnp.float32)
        acc0 = jnp.zeros((head_dim, block_q), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).T.astype(o_ref.dtype)  # VMEM transpose
    lse_ref[0, 0] = (m + jnp.log2(jnp.maximum(l, 1e-30)))[0]


def qkv_blocks(s: int):
    """(block_q, block_k) for the packed kernel, or None when no config
    divides S (caller falls back to the padded split-operand path). Mirrors
    the dispatch sweep in ops/attention.py: long sequences loop 1024-blocks;
    mid-range runs the whole K extent as one block with the q block sized so
    the fp32 logits stay inside scoped VMEM."""
    if s % 8 != 0:
        return None
    if s >= 4096:
        for bq in (1024, 512, 256, 128):
            if s % bq == 0:
                return bq, (1024 if s % 1024 == 0 else bq)
        return None
    bq_cap = min(s, max(8, 11_000_000 // (4 * s)))
    for bq in range(bq_cap - bq_cap % 8, 0, -8):  # trace-time-only loop
        if s % bq == 0:
            return bq, s
    return None


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _flash_qkv_fwd_impl(qkv, num_heads, scale, interpret=None):
    if interpret is None:  # auto: Mosaic on TPU, interpreter elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
    b, s, c3 = qkv.shape
    c = c3 // 3
    h = c // num_heads
    blocks = qkv_blocks(s)
    assert blocks is not None, f"no block config divides S={s}"
    block_q, block_k = blocks
    n = num_heads

    grid = (b, n, s // block_q)
    kernel = functools.partial(_flash_kernel_qkv, scale=scale, block_k=block_k, s_len=s)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, h), lambda bi, ni, qi: (bi, qi, ni)),
            pl.BlockSpec((1, s, h), lambda bi, ni, qi: (bi, 0, n + ni)),
            pl.BlockSpec((1, s, h), lambda bi, ni, qi: (bi, 0, 2 * n + ni)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, h), lambda bi, ni, qi: (bi, qi, ni)),
            pl.BlockSpec((1, 1, block_q), lambda bi, ni, qi: (bi, ni, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, s), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_qkv(qkv: jax.Array, num_heads: int, scale: float) -> jax.Array:
    """Self-attention directly on the fused-QKV projection output.

    qkv: (B, S, 3C) laid out [q | k | v], C = num_heads * head_dim.
    Returns (B, S, C) in qkv.dtype. No splits/transposes touch HBM on the
    forward path; the backward (training) splits into per-head operands and
    reuses the blockwise Pallas flash backward."""
    out, _ = _flash_qkv_fwd_impl(qkv, num_heads, scale)
    return out


def _fa_qkv_fwd(qkv, num_heads, scale):
    out, lse = _flash_qkv_fwd_impl(qkv, num_heads, scale)
    return out, (qkv, out, lse)


def _fa_qkv_bwd(num_heads, scale, res, do):
    qkv, out, lse = res
    b, s, c3 = qkv.shape
    c = c3 // 3
    h = c // num_heads
    unpack = lambda x: x.reshape(b, s, num_heads, h)
    q, k, v = (unpack(jax.lax.slice_in_dim(qkv, i * c, (i + 1) * c, axis=2))
               for i in range(3))
    # _flash_bwd consumes the head-folded lse of _flash_fwd_lse: (B*N, Sq).
    lse_f = lse.reshape(b * num_heads, s)
    dq, dk, dv = _flash_bwd(q, k, v, unpack(out), lse_f, unpack(do), scale,
                            block_q=512, block_k=512,
                            interpret=jax.default_backend() != "tpu")
    dqkv = jnp.concatenate(
        [x.reshape(b, s, c) for x in (dq, dk, dv)], axis=-1
    )
    return (dqkv,)


flash_attention_qkv.defvjp(_fa_qkv_fwd, _fa_qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_diff(q, k, v, scale, block_q=512, block_k=1024):
    """Differentiable flash attention: tq forward, blockwise Pallas backward.

    Same contract as flash_attention_tq; use this wherever gradients may flow
    (the attention dispatch routes through it on TPU)."""
    return flash_attention_tq(q, k, v, scale=scale, block_q=block_q, block_k=block_k)


def _fa_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _flash_fwd_lse(q, k, v, scale, block_q=block_q, block_k=block_k)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, block_q, block_k, res, do):
    q, k, v, out, lse = res
    # backward blocks: 512/512 keeps the recomputed (bq, bk) fp32 tiles and
    # the three fp32 accumulators inside scoped VMEM at every SVD shape
    return _flash_bwd(q, k, v, out, lse, do, scale, block_q=512, block_k=512)


flash_attention_diff.defvjp(_fa_fwd, _fa_bwd)
