"""Checkpoint save/restore/rotation tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from posetraj_tpu.configs import ControlNetConfig
from posetraj_tpu.models import controlnet as cn
from posetraj_tpu.train import checkpoints as ckpt


def _params():
    return cn.init_controlnet(jax.random.PRNGKey(0), ControlNetConfig.tiny())


def test_save_restore_roundtrip(tmp_path):
    params = _params()
    path = ckpt.save_checkpoint(str(tmp_path), 100, {"params": params, "step": jnp.asarray(100)})
    assert os.path.basename(path) == "checkpoint-100"
    target = {"params": cn.init_controlnet(None, ControlNetConfig.tiny()), "step": jnp.asarray(0)}
    restored = ckpt.restore_checkpoint(path, target)
    assert int(restored["step"]) == 100
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(restored["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotation_and_latest(tmp_path):
    params = {"x": jnp.ones((2,))}
    for step in (10, 20, 30):
        ckpt.save_checkpoint(str(tmp_path), step, params, keep_total_limit=2)
    names = sorted(os.listdir(tmp_path))
    assert "checkpoint-10" not in names
    assert {"checkpoint-20", "checkpoint-30"} <= set(names)
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith("checkpoint-30")


def test_export_diffusers(tmp_path):
    params = _params()
    out = ckpt.export_diffusers(params, "controlnet", str(tmp_path / "controlnet"))
    assert os.path.getsize(out) > 0
