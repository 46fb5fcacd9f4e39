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


def test_erf_approximation_accuracy():
    from posetraj_tpu.ops.pallas_mlp import _erf

    x = jnp.linspace(-6.0, 6.0, 4001)
    err = jnp.max(jnp.abs(_erf(x) - jax.scipy.special.erf(x)))
    assert float(err) < 1e-6  # A&S 7.1.26 bound + fp32 eval noise — far below bf16 resolution
