"""Parameter initializers.

Matches PyTorch layer defaults (kaiming-uniform with a=sqrt(5) for weights,
U(+-1/sqrt(fan_in)) for biases — both reduce to U(+-1/sqrt(fan_in)) bounds for
the weight too) so that training-from-scratch dynamics mirror the reference,
plus the zero-init used by ControlNet zero-convs (controlnet_sdv.py:860-863)
and the identity/zero init of the camera projection
(train_svd_traj_VIPSeg_14_cam_concat.py:1002-1004).

Initialization is host-side numpy seeded from the JAX key: a model init is a
one-time host operation, and driving it through traced `jax.random` ops costs
minutes of XLA compile time for zero benefit (thousands of distinct tiny
shapes). `jax.random.split` is still used for key-structure plumbing so inits
stay deterministic per key.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class HostKey:
    """Host-side RNG key (np.random.SeedSequence) for parameter init.

    Converting a JAX key to host data costs ~40ms per call (device round-trip
    + dispatch); over the ~2k leaves of the full UNet that is minutes. A model
    init therefore converts the incoming JAX key ONCE and all nested splits
    happen host-side via SeedSequence.spawn (microseconds each).
    """

    __slots__ = ("ss",)

    def __init__(self, ss: np.random.SeedSequence):
        self.ss = ss


def ensure_host_key(key) -> HostKey:
    if isinstance(key, HostKey):
        return key
    data = np.asarray(jax.random.key_data(key)).ravel()
    return HostKey(np.random.SeedSequence([int(x) for x in data]))


def rsplit(key, n: int = 2):
    """Host-side key split for init code; drop-in for jax.random.split.

    key=None propagates "meta init" (zero-filled params — for shape-only uses
    like param counting or building checkpoint-restore targets without paying
    for random generation).
    """
    if key is None:
        return [None] * n
    return [HostKey(ss) for ss in ensure_host_key(key).ss.spawn(n)]


def _np_rng(key) -> np.random.Generator:
    return np.random.default_rng(ensure_host_key(key).ss)


def torch_uniform(key, shape: Sequence[int], fan_in: int, dtype=jnp.float32) -> jax.Array:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's Linear/Conv default bound."""
    if key is None:
        return jnp.zeros(tuple(shape), dtype)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    arr = _np_rng(key).random(size=tuple(shape), dtype=np.float32) * (2.0 * bound) - bound
    return jnp.asarray(arr, dtype)


def linear_init(key: jax.Array, in_dim: int, out_dim: int, use_bias: bool = True, dtype=jnp.float32) -> dict:
    """Linear layer params: weight stored (in, out) — column-major for x @ W."""
    kw, kb = rsplit(key)
    p = {"kernel": torch_uniform(kw, (in_dim, out_dim), in_dim, dtype)}
    if use_bias:
        p["bias"] = torch_uniform(kb, (out_dim,), in_dim, dtype)
    return p


def conv_init(
    key: jax.Array,
    kernel_shape: Sequence[int],
    use_bias: bool = True,
    dtype=jnp.float32,
) -> dict:
    """Conv params with kernel layout (*spatial, in, out) (HWIO / DHWIO)."""
    kw, kb = rsplit(key)
    *spatial, in_ch, out_ch = kernel_shape
    fan_in = in_ch * int(math.prod(spatial))
    p = {"kernel": torch_uniform(kw, tuple(kernel_shape), fan_in, dtype)}
    if use_bias:
        p["bias"] = torch_uniform(kb, (out_ch,), fan_in, dtype)
    return p


def zero_conv_init(kernel_shape: Sequence[int], dtype=jnp.float32) -> dict:
    """Zero-initialized conv — ControlNet residual heads (controlnet_sdv.py:860-863)."""
    *_, out_ch = kernel_shape
    return {
        "kernel": jnp.zeros(tuple(kernel_shape), dtype),
        "bias": jnp.zeros((out_ch,), dtype),
    }


def zero_linear_init(in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    return {"kernel": jnp.zeros((in_dim, out_dim), dtype), "bias": jnp.zeros((out_dim,), dtype)}


def identity_pad_linear_init(in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """Identity on the first out_dim inputs, zero elsewhere, zero bias.

    The camera cc_projection init: eye over the embedding channels so that at
    step 0 the module passes the hint embedding through unchanged and ignores
    the camera vector (train_svd_traj_VIPSeg_14_cam_concat.py:1002-1004).
    """
    kernel = jnp.zeros((in_dim, out_dim), dtype)
    kernel = kernel.at[:out_dim, :].set(jnp.eye(out_dim, dtype=dtype))
    return {"kernel": kernel, "bias": jnp.zeros((out_dim,), dtype)}


def norm_init(num_channels: int, dtype=jnp.float32) -> dict:
    """GroupNorm/LayerNorm affine params (torch default: scale 1, bias 0)."""
    return {"scale": jnp.ones((num_channels,), dtype), "bias": jnp.zeros((num_channels,), dtype)}


def normal(key, shape: Sequence[int], std: float = 1.0, dtype=jnp.float32) -> jax.Array:
    if key is None:
        return jnp.zeros(tuple(shape), dtype)
    arr = _np_rng(key).standard_normal(size=tuple(shape), dtype=np.float32) * std
    return jnp.asarray(arr, dtype)


def embedding_init(key: jax.Array, num: int, dim: int, dtype=jnp.float32) -> dict:
    """nn.Embedding default: N(0, 1)."""
    return {"embedding": normal(key, (num, dim), 1.0, dtype)}
