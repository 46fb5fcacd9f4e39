"""Device mesh + sharding rules.

The reference's entire distributed story is HF Accelerate DDP over NCCL
(train_svd_traj_blender_14.py:821-827, 1066-1069; SURVEY.md 2.12-2.13). The
TPU-native equivalent is a `jax.sharding.Mesh` with XLA-compiled collectives:

  * axis "data"  — batch/CFG data parallelism (the DP equivalent; gradients
    all-reduce via pjit-inserted psum over ICI).
  * axis "model" — tensor parallelism for the big transformer weights: QKV/FF
    kernels shard their output column axis, output projections shard the
    input row axis, so each attention/FF pair needs a single psum per block
    (Megatron-style column->row pairing), all inserted by XLA's SPMD
    partitioner from the parameter shardings below.

No hand-written collectives: lay out shardings, let XLA place all-gathers /
reduce-scatters on ICI (SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from posetraj_tpu.core.params import flatten_dict, unflatten_dict

# Weight-name suffixes that shard over "model" on their output (column) axis;
# the matching row-sharded output projections keep activations correct with
# one collective per block.
_COLUMN_SHARDED = ("to_q", "to_k", "to_v", "proj_in", "fc1", "linear_1")
_ROW_SHARDED = ("to_out", "proj_out", "fc2", "linear_2")


def initialize_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host pod init (jax.distributed). On Cloud TPU pods all arguments
    auto-detect from the metadata server; pass them explicitly elsewhere.
    The NCCL/Accelerate-free equivalent of the reference's
    `accelerate launch` process bootstrap (train_svd_traj_blender_14.py:821)."""
    import jax

    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator, num_processes=num_processes, process_id=process_id
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    """Mesh over ("data", "model"). Defaults to all visible devices on data."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    assert n_data * n_model == devices.size, (n_data, n_model, devices.size)
    return Mesh(devices.reshape(n_data, n_model), ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _spec_for(name: str, leaf, n_model: int) -> P:
    if n_model <= 1 or leaf.ndim < 2:
        return P()
    parent = name.rsplit(".", 1)[0].rsplit(".", 1)[-1]
    if parent in _COLUMN_SHARDED and leaf.shape[-1] % n_model == 0:
        return P(*([None] * (leaf.ndim - 1)), "model")
    if parent in _ROW_SHARDED and leaf.shape[-2] % n_model == 0:
        return P(*([None] * (leaf.ndim - 2)), "model", None)
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings: transformer matmul weights tensor-parallel
    over "model", everything else replicated. Bias terms of column-sharded
    layers follow their kernel's output axis."""
    n_model = mesh.shape["model"]
    flat = flatten_dict(params)
    out = {}
    for name, leaf in flat.items():
        if name.endswith(".bias"):
            parent = name.rsplit(".", 2)[-2] if "." in name else ""
            if n_model > 1 and parent in _COLUMN_SHARDED and leaf.shape[-1] % n_model == 0:
                out[name] = NamedSharding(mesh, P("model"))
            else:
                out[name] = NamedSharding(mesh, P())
        else:
            out[name] = NamedSharding(mesh, _spec_for(name, leaf, n_model))
    return unflatten_dict(out)


def shard_params(params, shardings):
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
