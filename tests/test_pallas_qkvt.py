"""Transposed-packed attention sub-layer (ops/pallas_qkvt.py) vs the plain
XLA formulation — interpret mode on CPU (conftest pins cpu), Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np


def _ref(x, ln_s, ln_b, wqkv, wo, bo, n, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps) * ln_s + ln_b).astype(x.dtype)
    qkv = h @ wqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    b, s, c = x.shape
    hd = c // n
    fold = lambda t: t.reshape(b, s, n, hd).transpose(0, 2, 1, 3)
    qh, kh, vh = fold(q), fold(k), fold(v)
    logits = jnp.einsum("bnqh,bnkh->bnqk", qh, kh).astype(jnp.float32) * hd**-0.5
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnqk,bnkh->bnqh", p, vh).transpose(0, 2, 1, 3).reshape(b, s, c)
    return x + o @ wo + bo


def _make(b=2, s=256, c=128, n=2, seed=0):
    rng = np.random.RandomState(seed)
    f32 = jnp.float32
    return (
        jnp.asarray(rng.randn(b, s, c), f32),
        jnp.asarray(rng.rand(c), f32),
        jnp.asarray(rng.randn(c) * 0.1, f32),
        jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), f32),
        jnp.asarray(rng.randn(c, c) / np.sqrt(c), f32),
        jnp.asarray(rng.randn(c) * 0.1, f32),
        n,
    )


def test_qkvt_proj_matches_ref():
    from posetraj_tpu.ops.pallas_qkvt import ln_qkvt_proj

    x, ln_s, ln_b, wqkv, _, _, _ = _make()
    got = ln_qkvt_proj(x, wqkv.T, ln_s, ln_b, interpret=True)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
    want = jnp.einsum("dc,bsc->bds", wqkv.T, h.astype(x.dtype))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_qkvt_attention_matches_xla():
    from posetraj_tpu.ops.pallas_qkvt import qkvt_attention

    rng = np.random.RandomState(1)
    b, s, n, hd = 2, 256, 2, 64
    c = n * hd
    qkv_t = jnp.asarray(rng.randn(b, 3 * c, s), jnp.float32)
    got = qkvt_attention(qkv_t, n, hd**-0.5, interpret=True)
    q, k, v = (qkv_t[:, i * c:(i + 1) * c].reshape(b, n, hd, s) for i in range(3))
    logits = jnp.einsum("bnhq,bnhk->bnqk", q, k) * hd**-0.5
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qkv_t.dtype)
    want = jnp.einsum("bnqk,bnhk->bnhq", p, v).reshape(b, c, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_attn_sublayer_matches_ref():
    from posetraj_tpu.ops.pallas_qkvt import attn_sublayer

    args = _make()
    got = attn_sublayer(*args)
    want = _ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4)


def test_attn_sublayer_multi_qblock():
    """S=1536 runs the mid-range single-K-block config with multiple q blocks
    on TPU; in interpret mode it exercises the same grid decomposition."""
    from posetraj_tpu.ops.pallas_qkvt import attn_sublayer, qkvt_blocks

    bq, bk = qkvt_blocks(1536)
    assert bk == 1536 and 1536 % bq == 0
    args = _make(b=1, s=1536, c=128, n=2, seed=3)
    got = attn_sublayer(*args)
    want = _ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4)


def test_attn_sublayer_grads_match_ref():
    from posetraj_tpu.ops.pallas_qkvt import attn_sublayer

    x, ln_s, ln_b, wqkv, wo, bo, n = _make(b=1, s=128, c=128)

    def loss_f(f):
        return lambda x, ln_s, ln_b, wqkv, wo, bo: jnp.sum(
            jnp.tanh(f(x, ln_s, ln_b, wqkv, wo, bo, n))
        )

    g = jax.grad(loss_f(attn_sublayer), argnums=(0, 1, 2, 3, 4, 5))(
        x, ln_s, ln_b, wqkv, wo, bo
    )
    g_ref = jax.grad(loss_f(_ref), argnums=(0, 1, 2, 3, 4, 5))(
        x, ln_s, ln_b, wqkv, wo, bo
    )
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3)


def test_qkvt_blocks_tiling():
    from posetraj_tpu.ops.pallas_qkvt import qkvt_blocks

    for s in (9216, 6144, 4608, 2304, 1536, 1024, 576, 384):
        blocks = qkvt_blocks(s)
        assert blocks is not None, s
        bq, bk = blocks
        assert s % bq == 0 and s % bk == 0, (s, bq, bk)
        assert bq % 128 == 0 or bq == s, (s, bq)
        assert 4 * bq * bk <= 16_000_000, (s, bq, bk)
    assert qkvt_blocks(2880) is None  # 2880 has no 128-aligned divisor


def test_applicability_gate_env_off(monkeypatch):
    from posetraj_tpu.ops.pallas_qkvt import attn_sublayer_applicable

    x = jnp.zeros((2, 9216, 320))
    monkeypatch.setenv("POSETRAJ_QKVT_ATTN", "0")
    assert not attn_sublayer_applicable(x, 5)


def test_applicability_gate_backend():
    import jax as _jax

    from posetraj_tpu.ops.pallas_qkvt import attn_sublayer_applicable

    x = jnp.zeros((2, 9216, 320))
    applicable = attn_sublayer_applicable(x, 5)
    if _jax.default_backend() == "tpu":
        assert applicable  # flagship L0 shape must stay on the packed path
    else:
        assert not applicable  # backend gate keeps CPU/GPU on the einsum path
