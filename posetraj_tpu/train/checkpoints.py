"""Checkpoint save/restore with rotation, plus diffusers-layout export.

Replaces the reference's Accelerate save_state/load_state + custom hooks
(train_svd_traj_blender_14.py:940-973, 1386-1417): checkpoints live under
`<dir>/checkpoint-<step>/` with the ControlNet (and EMA twin) stored as
Orbax pytrees; `keep_total_limit` rotates old steps away
(:1386-1401 checkpoints_total_limit); `latest_checkpoint` supports
`--resume_from_checkpoint latest` (:1174-1197). `export_diffusers` writes a
torch-layout .safetensors so reference tooling can load our weights.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional

import jax
import numpy as np


def _ckpt_dirs(root: str) -> List[str]:
    if not os.path.isdir(root):
        return []
    out = [d for d in os.listdir(root) if re.fullmatch(r"checkpoint-\d+", d)]
    return sorted(out, key=lambda d: int(d.split("-")[1]))


def latest_checkpoint(root: str) -> Optional[str]:
    dirs = _ckpt_dirs(root)
    return os.path.join(root, dirs[-1]) if dirs else None


def save_checkpoint(
    root: str,
    step: int,
    state: Any,
    keep_total_limit: Optional[int] = None,
) -> str:
    """Serialize a TrainState (or any pytree) under checkpoint-<step>."""
    import orbax.checkpoint as ocp

    path = os.path.join(root, f"checkpoint-{step}")
    state = jax.device_get(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), state, force=True)
    if keep_total_limit:
        dirs = _ckpt_dirs(root)
        for d in dirs[: max(0, len(dirs) - keep_total_limit)]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (use meta-init (key=None) params
    to build a cheap target).

    When `target` holds committed jax.Arrays (the Trainer's sharded
    TrainState on a mesh run), restore goes through an abstract
    ShapeDtypeStruct-with-sharding target, so every restored leaf comes back
    with the SAME mesh layout (TP-sharded params/moments stay TP-sharded) —
    a resumed pod run keeps its layouts instead of silently replicating
    (reference equivalent: accelerate load_state restores into the
    already-wrapped modules, train_svd_traj_blender_14.py:952-970)."""
    import orbax.checkpoint as ocp

    def abstract(x):
        if isinstance(x, jax.Array):
            if isinstance(x.sharding, jax.sharding.SingleDeviceSharding):
                # Uncommitted leaves (e.g. optax inner counts before step 1)
                # must stay uncommitted: restoring them as device-committed
                # single-device arrays would conflict with the mesh-sharded
                # leaves inside the jitted step. Restore as host numpy.
                return jax.device_get(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.join(path, "state"), jax.tree_util.tree_map(abstract, target)
        )


def export_diffusers(params: Any, model: str, out_path: str) -> str:
    """Write our pytree as a torch-layout .safetensors (or .npz fallback) so
    diffusers-based tooling can consume trained ControlNets."""
    from posetraj_tpu.tools.convert_weights import convert_to_torch

    sd = convert_to_torch(jax.device_get(params), model)
    try:
        from safetensors.numpy import save_file

        if not out_path.endswith(".safetensors"):
            out_path += ".safetensors"
        save_file(sd, out_path)
    except ImportError:
        if not out_path.endswith(".npz"):
            out_path += ".npz"
        np.savez(out_path, **sd)
    return out_path
