"""Transposed-packed temporal attention sub-layer (ops/pallas_temporal.py)
vs the XLA frame-axis einsum formulation — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np


def _make(b=2, f=7, s=128, c=128, n=2, seed=0):
    rng = np.random.RandomState(seed)
    f32 = jnp.float32
    return (
        jnp.asarray(rng.randn(b, f, s, c), f32),
        jnp.asarray(rng.rand(c), f32),
        jnp.asarray(rng.randn(c) * 0.1, f32),
        jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), f32),
        jnp.asarray(rng.randn(c, c) / np.sqrt(c), f32),
        jnp.asarray(rng.randn(c) * 0.1, f32),
        n,
    )


def test_frame_attention_t_matches_einsum():
    from posetraj_tpu.ops.pallas_temporal import frame_attention_t

    rng = np.random.RandomState(1)
    b, f, s, n, hd = 2, 5, 256, 2, 64
    c = n * hd
    qkv4 = jnp.asarray(rng.randn(b, f, 3 * c, s), jnp.float32)
    got = frame_attention_t(qkv4, n, hd**-0.5, interpret=True)  # (b, f, c, s)

    q, k, v = (qkv4[:, :, i * c:(i + 1) * c].reshape(b, f, n, hd, s) for i in range(3))
    logits = jnp.einsum("bqnhs,bknhs->bnqks", q, k) * hd**-0.5
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=3)
    want = jnp.einsum("bnqks,bknhs->bqnhs", p, v).reshape(b, f, c, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_temporal_sublayer_matches_ref():
    from posetraj_tpu.ops.pallas_temporal import (
        _ref_temporal_sublayer,
        temporal_attn_sublayer,
    )

    args = _make()
    got = temporal_attn_sublayer(*args)
    want = _ref_temporal_sublayer(*args, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4)


def test_temporal_sublayer_multi_sblock():
    """S=384 picks bs=384 with F*S=2688 -> token blocks of 384 in kernels 1/3."""
    from posetraj_tpu.ops.pallas_temporal import (
        _ref_temporal_sublayer,
        temporal_attn_sublayer,
    )

    args = _make(b=1, f=7, s=384, c=128, n=2, seed=3)
    got = temporal_attn_sublayer(*args)
    want = _ref_temporal_sublayer(*args, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4)


def test_temporal_sublayer_grads_match_ref():
    from posetraj_tpu.ops.pallas_temporal import (
        _ref_temporal_sublayer,
        temporal_attn_sublayer,
    )

    x, ln_s, ln_b, wqkv, wo, bo, n = _make(b=1, f=3, s=128, c=128)

    def loss_f(f):
        return lambda x, ln_s, ln_b, wqkv, wo, bo: jnp.sum(
            jnp.tanh(f(x, ln_s, ln_b, wqkv, wo, bo, n))
        )

    ref = lambda *a: _ref_temporal_sublayer(*a, eps=1e-5)
    g = jax.grad(loss_f(temporal_attn_sublayer), argnums=(0, 1, 2, 3, 4, 5))(
        x, ln_s, ln_b, wqkv, wo, bo
    )
    g_ref = jax.grad(loss_f(ref), argnums=(0, 1, 2, 3, 4, 5))(
        x, ln_s, ln_b, wqkv, wo, bo
    )
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3)


def test_frame_block_s_vmem_budget():
    from posetraj_tpu.ops.pallas_temporal import (
        _BYTES_PER_BLOCK_ELEM,
        _VMEM_BUDGET,
        frame_block_s,
    )

    # Flagship (head_dim=64, F=14): only bs=128 fits the scoped-VMEM budget.
    # BENCH_r03 postmortem: bs=512 at this config needs 26.83 MB > 16 MB limit.
    for s, want in ((9216, 128), (2304, 128), (1024, 128), (144, 144), (576, None)):
        assert frame_block_s(s, 64, 14) == want, s
        if want is not None:
            assert 64 * 14 * want * _BYTES_PER_BLOCK_ELEM <= _VMEM_BUDGET
    # Smaller F or head_dim admits larger blocks.
    assert frame_block_s(9216, 64, 7) == 384
    assert frame_block_s(9216, 32, 14) == 384
    # Non-tiling S stays None regardless of budget.
    assert frame_block_s(9217, 8, 2) is None


def test_applicability_gate_env_off(monkeypatch):
    from posetraj_tpu.ops.pallas_temporal import temporal_attn_sublayer_applicable

    x = jnp.zeros((2, 14, 9216, 320))
    monkeypatch.setenv("POSETRAJ_TEMPORAL_ATTN", "0")
    assert not temporal_attn_sublayer_applicable(x, 5)


def test_applicability_gate_backend():
    import jax as _jax

    from posetraj_tpu.ops.pallas_temporal import temporal_attn_sublayer_applicable

    x = jnp.zeros((2, 14, 9216, 320))
    applicable = temporal_attn_sublayer_applicable(x, 5)
    if _jax.default_backend() == "tpu":
        assert applicable  # flagship L0 shape must stay on the packed path
    else:
        assert not applicable  # backend gate keeps CPU/GPU on the einsum path
