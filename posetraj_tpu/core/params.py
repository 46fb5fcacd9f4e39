"""Parameter-pytree utilities: counting, casting, flattening, EMA."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax

PyTree = Any


def count_params(tree: PyTree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def cast(tree: PyTree, dtype) -> PyTree:
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def flatten_dict(tree, prefix: str = "", sep: str = ".") -> Dict[str, jax.Array]:
    """Nested dict/list -> {"a.0.c": leaf} for weight conversion and audits."""
    out = {}
    items = tree.items() if isinstance(tree, dict) else enumerate(tree)
    for k, v in items:
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, (dict, list)):
            out.update(flatten_dict(v, key, sep))
        else:
            out[key] = v
    return out


def unflatten_dict(flat: Dict[str, jax.Array], sep: str = ".") -> Dict:
    """Inverse of flatten_dict; integer path segments rebuild lists."""
    out: Dict = {}
    for key, v in flat.items():
        parts = key.split(sep)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def fix(node):
        if not isinstance(node, dict):
            return node
        node = {k: fix(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return fix(out)


def ema_update(ema: PyTree, new: PyTree, decay) -> PyTree:
    """EMA step equivalent to diffusers EMAModel at fixed decay
    (train_svd_traj_blender_14.py:920-923, 1379-1380). `decay` may be a traced
    scalar (see ema_decay_schedule)."""
    return jax.tree_util.tree_map(lambda e, p: decay * e + (1.0 - decay) * p, ema, new)


def ema_decay_schedule(optimization_step, max_decay: float = 0.9999):
    """diffusers EMAModel.get_decay warmup ramp (default, use_ema_warmup=False):
    decay = min(max_decay, (1+step)/(10+step)) with step = optimization_step-1,
    and 0.0 on the very first update (shadow := params). This is the schedule
    behind the reference's EMA steps (train_svd_traj_blender_14.py:920-923,
    1379-1380); a fixed decay from step 0 diverges from reference dynamics
    early in training.

    `optimization_step` is the 1-based count of completed optimizer updates
    (EMA steps only happen on gradient-sync boundaries)."""
    import jax.numpy as jnp

    step = jnp.maximum(optimization_step - 1, 0).astype(jnp.float32)
    decay = jnp.minimum((1.0 + step) / (10.0 + step), max_decay)
    return jnp.where(step <= 0, 0.0, decay)


def param_audit(tree: PyTree, trainable_fn: Callable[[str], bool] | None = None) -> str:
    """Human-readable frozen-vs-trainable listing, standing in for the
    reference's rec_para.txt dumps (train_svd_traj_blender_14.py:1029-1038)."""
    lines = []
    for name, leaf in sorted(flatten_dict(tree).items()):
        trainable = trainable_fn(name) if trainable_fn else True
        tag = "train " if trainable else "frozen"
        lines.append(f"{tag} {name} {tuple(leaf.shape)} {leaf.dtype}")
    return "\n".join(lines)
