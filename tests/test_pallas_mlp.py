"""Fused GEGLU-MLP kernel parity vs the XLA formulation (interpret mode on
CPU; compiles via Mosaic on TPU — see ops/pallas_mlp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetraj_tpu.ops.pallas_mlp import _fused_impl, _ref_geglu_mlp


@pytest.mark.parametrize("m,k,n,bm,bn", [
    (300, 128, 256, 128, 128),   # row padding + multi n-block
    (512, 320, 1280, 256, 0),    # L0-like: K not lane-aligned, single n block
    (256, 256, 1280, 128, 640),  # wide-model style n blocking
])
def test_fused_geglu_matches_reference(m, k, n, bm, bn):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    w1 = jnp.asarray(rng.randn(k, 2 * n) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(2 * n) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(n, k) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(k) * 0.1, jnp.float32)
    ref = _ref_geglu_mlp(x, w1, b1, w2, b2)
    out = _fused_impl(x, w1, b1, w2, b2, block_m=bm, block_n=bn, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_fused_ln_geglu_matches_reference():
    from posetraj_tpu.ops.pallas_mlp import _fused_impl, _ref_ln_geglu_mlp

    rng = np.random.RandomState(1)
    m, k, n = 260, 256, 512
    x = jnp.asarray(rng.randn(m, k) * 2.0 + 0.5, jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(k), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.randn(k), jnp.float32)
    w1 = jnp.asarray(rng.randn(k, 2 * n) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(2 * n) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(n, k) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(k) * 0.1, jnp.float32)
    ref = _ref_ln_geglu_mlp(x, ln_s, ln_b, w1, b1, w2, b2)
    out = _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b,
                      block_m=128, block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_fused_ln_geglu_grad_matches_reference():
    from posetraj_tpu.ops.pallas_mlp import _ref_ln_geglu_mlp, fused_ln_geglu_mlp

    rng = np.random.RandomState(2)
    m, k, n = 64, 128, 256  # interpret-mode grad check on CPU
    import os

    if jax.default_backend() != "tpu":
        # custom_vjp backward goes through the XLA reference; check end-to-end
        # grads agree with differentiating the reference directly.
        x = jnp.asarray(rng.randn(m, k), jnp.float32)
        ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(k), jnp.float32)
        ln_b = jnp.asarray(0.1 * rng.randn(k), jnp.float32)
        w1 = jnp.asarray(rng.randn(k, 2 * n) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.randn(2 * n) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.randn(n, k) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.randn(k) * 0.1, jnp.float32)
        g_ref = jax.grad(lambda *a: jnp.sum(jnp.tanh(_ref_ln_geglu_mlp(*a))), argnums=(0, 1, 3))(
            x, ln_s, ln_b, w1, b1, w2, b2)
        # the fused forward isn't runnable off-TPU without interpret; check
        # the registered vjp math by calling the bwd rule directly.
        from posetraj_tpu.ops.pallas_mlp import _ln_bwd

        y = _ref_ln_geglu_mlp(x, ln_s, ln_b, w1, b1, w2, b2)
        ct = 1.0 - jnp.tanh(y) ** 2
        grads = _ln_bwd(1e-5, (x, ln_s, ln_b, w1, b1, w2, b2), ct)
        np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(g_ref[0]), atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(grads[1]), np.asarray(g_ref[1]), atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(grads[3]), np.asarray(g_ref[2]), atol=1e-4, rtol=1e-3)


def test_fused_ln_geglu_residual_matches_reference():
    from posetraj_tpu.ops.pallas_mlp import _fused_impl, _ref_ln_geglu_mlp_res

    rng = np.random.RandomState(3)
    m, k, n = 200, 256, 512
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(k), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.randn(k), jnp.float32)
    w1 = jnp.asarray(rng.randn(k, 2 * n) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(2 * n) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(n, k) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(k) * 0.1, jnp.float32)
    ref = _ref_ln_geglu_mlp_res(x, ln_s, ln_b, w1, b1, w2, b2)
    out = _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b,
                      block_m=128, block_n=256, interpret=True, residual=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("g,s_a,rep", [
    (4, 1, 128),    # per-sample vector (spatial attn2 fast path: (B*F, 1, C))
    (2, 128, 2),    # per-pixel slab shared over frames (temporal: (B, S, C))
])
def test_fused_ln_geglu_residual_addend(g, s_a, rep):
    """In-kernel broadcast-addend fold: out = (x+a) + mlp(ln(x+a)), forward
    and backward, vs the explicit-broadcast XLA formulation."""
    from posetraj_tpu.ops.pallas_mlp import (
        _broadcast_add_rows,
        _fused_impl,
        _ref_ln_geglu_mlp_res,
        _ref_ln_geglu_mlp_res_add,
        fused_ln_geglu_mlp_res_add,
    )

    rng = np.random.RandomState(4)
    k, n = 256, 512
    m = g * s_a * rep
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    add = jnp.asarray(rng.randn(g, s_a, k), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(k), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.randn(k), jnp.float32)
    w1 = jnp.asarray(rng.randn(k, 2 * n) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(2 * n) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(n, k) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(k) * 0.1, jnp.float32)

    ref = _ref_ln_geglu_mlp_res(_broadcast_add_rows(x, add), ln_s, ln_b, w1, b1, w2, b2)
    out = _fused_impl(x, w1, b1, w2, b2, ln_s=ln_s, ln_b=ln_b,
                      block_m=128, block_n=256, interpret=True, residual=True, add=add)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)

    # registered vjp math: bwd rule vs differentiating the reference directly
    # (the fused forward isn't runnable off-TPU without interpret)
    from posetraj_tpu.ops.pallas_mlp import _ln_res_add_bwd

    del fused_ln_geglu_mlp_res_add
    g_ref = jax.grad(
        lambda x_, a_: jnp.sum(jnp.tanh(_ref_ln_geglu_mlp_res_add(x_, ln_s, ln_b, w1, b1, w2, b2, a_))),
        argnums=(0, 1),
    )(x, add)
    y = _ref_ln_geglu_mlp_res_add(x, ln_s, ln_b, w1, b1, w2, b2, add)
    ct = 1.0 - jnp.tanh(y) ** 2
    grads = _ln_res_add_bwd(1e-5, (x, ln_s, ln_b, w1, b1, w2, b2, add), ct)
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(g_ref[0]), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(grads[7]), np.asarray(g_ref[1]), atol=1e-4, rtol=1e-3)


def test_erf_approximation_accuracy():
    from posetraj_tpu.ops.pallas_mlp import _erf

    x = jnp.linspace(-6.0, 6.0, 4001)
    err = jnp.max(jnp.abs(_erf(x) - jax.scipy.special.erf(x)))
    assert float(err) < 1e-6  # A&S 7.1.26 bound + fp32 eval noise — far below bf16 resolution
