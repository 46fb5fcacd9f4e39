"""Flash-attention kernel parity vs the XLA reference path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetraj_tpu.ops.attention import _xla_attention
from posetraj_tpu.ops.pallas_attention import flash_attention


@pytest.mark.parametrize("s,h,n", [(128, 64, 2), (300, 64, 1), (1024, 128, 2)])
def test_flash_matches_xla(s, h, n):
    rng = np.random.RandomState(0)
    b = 2
    q = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    scale = h**-0.5
    expect = _xla_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=5e-3, rtol=1e-2)  # interpret mode emulates TPU bf16 matmul precision


def test_flash_ragged_tail_masked():
    """Non-multiple-of-block sequence: padded K columns must not leak."""
    rng = np.random.RandomState(1)
    b, s, n, h = 1, 130, 1, 64
    q = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    expect = _xla_attention(q, k, v, h**-0.5)
    got = flash_attention(q, k, v, scale=h**-0.5, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=5e-3, rtol=1e-2)  # interpret mode emulates TPU bf16 matmul precision


def test_flash_q_grid_covers_tail_when_block_k_exceeds_block_q():
    """Regression: S=576 with (bq=512, bk clamped to 640) used to pad the
    sequence to 640 but emit a q-grid of 640//512 == 1, leaving rows 512..575
    unwritten (the production L2 spatial shape). Q and K/V padding are now
    independent."""
    rng = np.random.RandomState(2)
    b, s, n, h = 1, 576, 1, 64
    q = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    expect = _xla_attention(q, k, v, h**-0.5)
    got = flash_attention(q, k, v, scale=h**-0.5, block_q=512, block_k=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=5e-3, rtol=1e-2)
    # single-block fast path (no online rescale) at an exactly-divisible size
    got1 = flash_attention(q, k, v, scale=h**-0.5, block_q=576, block_k=576, interpret=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(expect), atol=5e-3, rtol=1e-2)


def test_fused_group_norm_matches_xla():
    from posetraj_tpu.ops.pallas_groupnorm import fused_group_norm
    from posetraj_tpu.ops.primitives import group_norm, silu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    params = {"scale": jnp.asarray(rng.rand(64), jnp.float32),
              "bias": jnp.asarray(rng.randn(64), jnp.float32)}
    expect = silu(group_norm(params, x, 32, 1e-5))
    got = fused_group_norm(x, params["scale"], params["bias"], 32, 1e-5, act=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5, rtol=2e-5)


def test_fused_group_norm_addend_fold():
    """In-kernel addend fold (resnet time-emb broadcast): per-sample (N, C)
    and per-frame (N, F, C) addends must match add-then-normalize, forward
    and backward."""
    from posetraj_tpu.ops.pallas_groupnorm import addend_foldable, fused_group_norm
    from posetraj_tpu.ops.primitives import group_norm, silu

    rng = np.random.RandomState(3)
    params = {"scale": jnp.asarray(rng.rand(64), jnp.float32),
              "bias": jnp.asarray(rng.randn(64), jnp.float32)}

    # per-sample (N, C) over (N, H, W, C) — resnet_block_2d norm2
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    t = jnp.asarray(rng.randn(2, 64), jnp.float32)
    assert addend_foldable(x, t)
    expect = silu(group_norm(params, x + t[:, None, None, :], 32, 1e-5))
    got = fused_group_norm(x, params["scale"], params["bias"], 32, 1e-5,
                           act=True, interpret=True, add=t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5, rtol=2e-5)

    # per-frame (B, F, C) over (B, F, H, W, C) — temporal_resnet_block norm2
    # (stats span the whole video: torch GroupNorm on (B, C, F, H, W))
    x5 = jnp.asarray(rng.randn(2, 3, 8, 8, 64), jnp.float32)
    t5 = jnp.asarray(rng.randn(2, 3, 64), jnp.float32)
    assert addend_foldable(x5, t5)
    expect5 = silu(group_norm(params, x5 + t5[:, :, None, None, :], 32, 1e-5))
    got5 = fused_group_norm(x5, params["scale"], params["bias"], 32, 1e-5,
                            act=True, interpret=True, add=t5)
    np.testing.assert_allclose(np.asarray(got5), np.asarray(expect5), atol=2e-5, rtol=2e-5)

    # gradients flow to x AND the addend through the custom_vjp
    def loss(x_, t_):
        y = fused_group_norm(x_, params["scale"], params["bias"], 32, 1e-5,
                             act=True, interpret=True, add=t_)
        return jnp.sum(y * y)

    def loss_ref(x_, t_):
        y = silu(group_norm(params, x_ + t_[:, None, None, :], 32, 1e-5))
        return jnp.sum(y * y)

    gx, gt = jax.grad(loss, argnums=(0, 1))(x, t)
    ex, et = jax.grad(loss_ref, argnums=(0, 1))(x, t)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(et), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("s,h,n", [(128, 64, 2), (300, 64, 1), (576, 64, 1), (1024, 128, 2)])
def test_flash_tq_matches_xla(s, h, n):
    """Transposed-accumulator kernel parity (interpret mode)."""
    from posetraj_tpu.ops.pallas_attention import flash_attention_tq

    rng = np.random.RandomState(1)
    b = 2
    q = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    scale = h**-0.5
    ref = _xla_attention(q, k, v, scale)
    out = flash_attention_tq(q, k, v, scale, block_q=256, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_layer_norm_matches_xla():
    import numpy as np

    from posetraj_tpu.ops.pallas_groupnorm import fused_layer_norm

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(3, 70, 320) * 2 + 1, jnp.float32)  # non-128 lane, padded rows
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(320), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(320), jnp.float32)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ref = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    got = fused_layer_norm(x, scale, bias, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_flash_fwd_lse_matches_plain_forward():
    import numpy as np

    from posetraj_tpu.ops.pallas_attention import _flash_fwd_lse, flash_attention_tq

    rng = np.random.RandomState(7)
    b, s, n, h = 2, 300, 2, 64  # ragged tail exercises both paddings
    q = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    ref = flash_attention_tq(q, k, v, scale=0.125, block_q=128, block_k=128, interpret=True)
    out, lse = _flash_fwd_lse(q, k, v, 0.125, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)
    assert lse.shape == (b * n, 384)


def test_flash_backward_matches_xla_grads():
    import numpy as np

    from posetraj_tpu.ops.attention import _xla_attention
    from posetraj_tpu.ops.pallas_attention import _flash_bwd, _flash_fwd_lse

    rng = np.random.RandomState(8)
    b, s, n, h = 1, 260, 2, 64  # ragged: padded q rows + k cols masked in bwd
    scale = h ** -0.5
    q = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, n, h), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(jnp.tanh(_xla_attention(q, k, v, scale)))

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    out, lse = _flash_fwd_lse(q, k, v, scale, block_q=128, block_k=128, interpret=True)
    do = 1.0 - jnp.tanh(_xla_attention(q, k, v, scale)) ** 2
    dq, dk, dv = _flash_bwd(q, k, v, out, lse, do, scale,
                            block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), atol=5e-5, rtol=1e-4)


def test_flash_qkv_packed_matches_xla():
    """Packed-QKV kernel: per-head tiles sliced straight out of (B, S, 3C)
    via BlockSpec index maps must equal the split-operand XLA reference."""
    from posetraj_tpu.ops.pallas_attention import _flash_qkv_fwd_impl

    rng = np.random.RandomState(11)
    b, s, n, h = 2, 256, 2, 64
    c = n * h
    qkv = jnp.asarray(rng.randn(b, s, 3 * c), jnp.float32)
    q, k, v = (x.reshape(b, s, n, h) for x in np.split(np.asarray(qkv), 3, axis=-1))
    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h**-0.5)
    out, lse = _flash_qkv_fwd_impl(qkv, n, h**-0.5, interpret=True)
    assert out.shape == (b, s, c)
    assert lse.shape == (b, n, s)
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, s, n, h), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_flash_qkv_backward_matches_xla_grads():
    """custom_vjp of the packed kernel vs autodiff through the XLA path."""
    from posetraj_tpu.ops.pallas_attention import flash_attention_qkv

    rng = np.random.RandomState(12)
    b, s, n, h = 1, 128, 2, 64
    c = n * h
    qkv = jnp.asarray(rng.randn(b, s, 3 * c), jnp.float32)
    scale = h**-0.5

    def loss_ref(qkv):
        q, k, v = (x.reshape(b, s, n, h) for x in jnp.split(qkv, 3, axis=-1))
        return jnp.sum(jnp.tanh(_xla_attention(q, k, v, scale)))

    def loss_pallas(qkv):
        return jnp.sum(jnp.tanh(flash_attention_qkv(qkv, n, scale)))

    g_ref = jax.grad(loss_ref)(qkv)
    g = jax.grad(loss_pallas)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-5, rtol=1e-4)


def test_qkv_blocks_divide():
    from posetraj_tpu.ops.pallas_attention import qkv_blocks

    for s in (576, 720, 2304, 2880, 9216, 4608):
        bq, bk = qkv_blocks(s)
        assert s % bq == 0 and s % bk == 0, (s, bq, bk)
        assert 4 * bq * bk <= 16_000_000, (s, bq, bk)  # fp32 logits in VMEM
    assert qkv_blocks(130) is None  # ragged -> caller falls back
