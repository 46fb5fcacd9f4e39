"""Trainer tests: loss math, single-step descent, sharded multi-device step
on the virtual 8-device CPU mesh (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetraj_tpu.configs import TrainConfig
from posetraj_tpu.models import clip as clip_m
from posetraj_tpu.models import controlnet as cn
from posetraj_tpu.models import unet as unet_m
from posetraj_tpu.models import vae as vae_m
from posetraj_tpu.parallel import make_mesh
from posetraj_tpu.pipeline import ModelBundle
from posetraj_tpu.train import Trainer, edm_training_loss
from posetraj_tpu.train.trainer import added_time_ids_train

B, F, H, W = 2, 2, 64, 64  # pixel-space H, W (latent 8x8 after the VAE x8)


@pytest.fixture(scope="module")
def setup():
    bundle = ModelBundle.tiny()
    key = jax.random.PRNGKey(0)
    frozen = {
        "unet": unet_m.init_unet(key, bundle.unet),
        "vae": vae_m.init_vae(key, bundle.vae),
        "clip": clip_m.init_clip_vision(key, bundle.clip),
    }
    cn_params = cn.init_controlnet(jax.random.PRNGKey(1), bundle.controlnet)
    return bundle, frozen, cn_params


def _batch(b=B):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": jnp.asarray(rng.rand(b, F, H, W, 3) * 2 - 1, jnp.float32),
        "trajectories": jnp.asarray(rng.rand(b, F, H, W, 3) * 2 - 1, jnp.float32),
        "motion_values": jnp.full((b,), 127.0),
    }


def test_added_time_ids_train_order():
    """Q3: train order is [fps, noise_aug, motion]."""
    ids = added_time_ids_train(jnp.asarray([127.0]), fps=6.0, noise_aug=0.02)
    np.testing.assert_allclose(np.asarray(ids), [[6.0, 0.02, 127.0]], rtol=1e-6)


def test_loss_finite_and_componentized(setup):
    bundle, frozen, cn_params = setup
    tcfg = TrainConfig(use_spatial_loss=True, gradient_checkpointing=False)
    loss, metrics = jax.jit(
        edm_training_loss, static_argnums=(2, 3), static_argnames=("compute_dtype",)
    )(cn_params, frozen, bundle, tcfg, _batch(), jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    assert float(metrics["loss_spatial"]) >= 0.0
    assert abs(float(metrics["loss_video"]) + 0.5 * float(metrics["loss_spatial"]) - float(loss)) < 1e-4


def test_train_step_updates_only_controlnet(setup):
    bundle, frozen, cn_params = setup
    tcfg = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=1, use_spatial_loss=False, lr_warmup_steps=0,
                       learning_rate=1e-3)
    trainer = Trainer(bundle, tcfg, frozen, cn_params, compute_dtype=jnp.float32)
    before = jax.tree_util.tree_leaves(trainer.state.controlnet_params)[0].copy()
    metrics = trainer.step(_batch())
    after = jax.tree_util.tree_leaves(trainer.state.controlnet_params)[0]
    assert np.isfinite(float(metrics["loss"]))
    assert float(trainer.state.step) == 1
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 0  # params moved
    # EMA initialized and close to params after one step
    assert trainer.state.ema_params is not None


def test_grad_accumulation_defers_update(setup):
    bundle, frozen, cn_params = setup
    tcfg = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=2, use_spatial_loss=False, lr_warmup_steps=0)
    trainer = Trainer(bundle, tcfg, frozen, cn_params, compute_dtype=jnp.float32)
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.state.controlnet_params)[0]).copy()
    trainer.step(_batch())
    p1 = np.asarray(jax.tree_util.tree_leaves(trainer.state.controlnet_params)[0])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: no update yet
    trainer.step(_batch())
    p2 = np.asarray(jax.tree_util.tree_leaves(trainer.state.controlnet_params)[0])
    assert np.abs(p2 - p1).max() > 0  # second micro-step applies


def test_sharded_train_step_on_8_device_mesh(setup):
    """DP over 'data' x TP over 'model' on the virtual CPU mesh — the
    multi-chip path the driver dry-runs."""
    bundle, frozen, cn_params = setup
    assert jax.device_count() >= 8, "conftest must expose 8 virtual devices"
    mesh = make_mesh(n_data=4, n_model=2)
    tcfg = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=1, use_spatial_loss=False, lr_warmup_steps=0)
    trainer = Trainer(bundle, tcfg, frozen, cn_params, mesh=mesh, compute_dtype=jnp.float32)
    metrics = trainer.step(_batch(b=4))
    assert np.isfinite(float(metrics["loss"]))
    assert float(trainer.state.step) == 1


def test_resume_into_sharded_state_keeps_layouts(setup, tmp_path):
    """save -> restore into a MESH trainer -> step must equal an
    uninterrupted mesh run, and restored leaves must keep their committed
    TP shardings (VERDICT round-2 missing #5: a wholesale numpy swap silently
    replicated TP-sharded params/moments on resume)."""
    from posetraj_tpu.train import checkpoints as ckpt

    bundle, frozen, cn_params = setup
    mesh = make_mesh(n_data=4, n_model=2)
    tcfg = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=1,
                       use_spatial_loss=False, lr_warmup_steps=0, learning_rate=1e-3)
    batch = _batch(b=4)

    # Uninterrupted: two steps.
    t_ref = Trainer(bundle, tcfg, frozen, cn_params, mesh=mesh, compute_dtype=jnp.float32)
    t_ref.step(batch)
    ref_m2 = t_ref.step(batch)

    # Interrupted: one step, save, restore into a FRESH mesh trainer, step.
    t_a = Trainer(bundle, tcfg, frozen, cn_params, mesh=mesh, compute_dtype=jnp.float32)
    t_a.step(batch)
    path = ckpt.save_checkpoint(str(tmp_path), 1, t_a.state)

    t_b = Trainer(bundle, tcfg, frozen, cn_params, mesh=mesh, compute_dtype=jnp.float32)
    want = jax.tree_util.tree_leaves(t_b.state.controlnet_params)
    t_b.state = ckpt.restore_checkpoint(path, t_b.state)
    assert int(t_b.state.step) == 1
    got = jax.tree_util.tree_leaves(t_b.state.controlnet_params)
    mismatched = sum(
        not w.sharding.is_equivalent_to(g.sharding, g.ndim)
        for w, g in zip(want, got)
    )
    assert mismatched == 0, f"{mismatched} leaves lost their sharding"
    # TP layouts must actually be present (not all-replicated).
    assert any(
        not g.sharding.is_fully_replicated for g in got
    ), "expected at least one TP-sharded leaf"

    m2 = t_b.step(batch)
    np.testing.assert_allclose(float(m2["loss"]), float(ref_m2["loss"]), rtol=1e-5)


def test_sharded_loss_matches_unsharded(setup):
    bundle, frozen, cn_params = setup
    tcfg = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=1, use_spatial_loss=False, lr_warmup_steps=0)
    batch = _batch(b=4)
    t_single = Trainer(bundle, tcfg, frozen, cn_params, compute_dtype=jnp.float32)
    m_single = t_single.step(batch)
    mesh = make_mesh(n_data=4, n_model=2)
    t_mesh = Trainer(bundle, tcfg, frozen, cn_params, mesh=mesh, compute_dtype=jnp.float32)
    m_mesh = t_mesh.step(batch)
    np.testing.assert_allclose(float(m_single["loss"]), float(m_mesh["loss"]), rtol=2e-3)


def test_remat_train_step_matches_no_remat(setup):
    """Gradient checkpointing must not change the loss value."""
    bundle, frozen, cn_params = setup
    batch = _batch()
    base = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=1,
                       use_spatial_loss=False, lr_warmup_steps=0)
    remat = TrainConfig(gradient_checkpointing=True, gradient_accumulation_steps=1,
                        use_spatial_loss=False, lr_warmup_steps=0)
    t_a = Trainer(bundle, base, frozen, cn_params, compute_dtype=jnp.float32)
    t_b = Trainer(bundle, remat, frozen, cn_params, compute_dtype=jnp.float32)
    m_a = t_a.step(batch)
    m_b = t_b.step(batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)


def test_cam_variant_training_loss(setup):
    """Camera-disentangled finetune path: cam_parameter flows into the cam
    hint encoder during training (train_svd_traj_VIPSeg_14_cam_concat.py:1393-1409)."""
    _, frozen, _ = setup
    bundle = ModelBundle.tiny("cam")
    cn_params = cn.init_controlnet(jax.random.PRNGKey(2), bundle.controlnet)
    tcfg = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=1,
                       use_spatial_loss=False, lr_warmup_steps=0)
    batch = _batch()
    batch["cam_parameter"] = jnp.asarray(np.random.RandomState(5).randn(B, F, 12), jnp.float32)
    loss, metrics = jax.jit(
        edm_training_loss, static_argnums=(2, 3), static_argnames=("compute_dtype",)
    )(cn_params, frozen, bundle, tcfg, batch, jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))


def test_ema_decay_ramp():
    """diffusers EMAModel.get_decay semantics: 0 on the first update (shadow
    := params), (1+s)/(10+s) ramp afterwards, capped at max_decay
    (train...blender_14.py:920-923, 1379-1380)."""
    from posetraj_tpu.core.params import ema_decay_schedule

    assert float(ema_decay_schedule(jnp.asarray(1))) == 0.0
    np.testing.assert_allclose(float(ema_decay_schedule(jnp.asarray(2))), 2.0 / 11.0, rtol=1e-6)
    np.testing.assert_allclose(float(ema_decay_schedule(jnp.asarray(5))), 5.0 / 14.0, rtol=1e-6)
    assert float(ema_decay_schedule(jnp.asarray(10_000_000))) == pytest.approx(0.9999)


def test_ema_steps_only_on_sync_and_ramps(setup):
    """With grad accumulation 2: EMA equals params exactly after the first
    optimizer update, is untouched on off-sync micro-steps, and blends with
    the ramp decay on the second update."""
    bundle, frozen, cn_params = setup
    tcfg = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=2,
                       use_spatial_loss=False, lr_warmup_steps=0, learning_rate=1e-3)
    trainer = Trainer(bundle, tcfg, frozen, cn_params, compute_dtype=jnp.float32)

    def leaf(tree):
        return np.asarray(jax.tree_util.tree_leaves(tree)[0])

    trainer.step(_batch())
    trainer.step(_batch())  # first sync -> decay 0 -> ema := params
    p1, e1 = leaf(trainer.state.controlnet_params), leaf(trainer.state.ema_params)
    np.testing.assert_array_equal(p1, e1)
    trainer.step(_batch())  # off-sync micro-step: ema untouched
    np.testing.assert_array_equal(leaf(trainer.state.ema_params), e1)
    trainer.step(_batch())  # second sync: decay = 2/11
    p2, e2 = leaf(trainer.state.controlnet_params), leaf(trainer.state.ema_params)
    d = 2.0 / 11.0
    np.testing.assert_allclose(e2, d * p1 + (1 - d) * p2, rtol=1e-5, atol=1e-7)


def test_bbox_variant_training_loss(setup):
    """Stage-1 bbox-supervised pretrain path: nonzero bbox wireframe maps flow
    through the dual-branch hint encoder during training (VERDICT next-#8;
    controlnet_sdv_bbox.py:95-136)."""
    _, frozen, _ = setup
    bundle = ModelBundle.tiny("bbox")
    cn_params = cn.init_controlnet(jax.random.PRNGKey(3), bundle.controlnet)
    tcfg = TrainConfig(gradient_checkpointing=False, gradient_accumulation_steps=1,
                       use_spatial_loss=False, lr_warmup_steps=0)
    batch = _batch()
    bbox = np.zeros((B, F, H, W, 3), np.float32)
    bbox[:, :, 20:40, 20:40] = 1.0
    batch["bbox_trajectories"] = jnp.asarray(bbox * 2 - 1)
    loss, metrics = jax.jit(
        edm_training_loss, static_argnums=(2, 3), static_argnames=("compute_dtype",)
    )(cn_params, frozen, bundle, tcfg, batch, jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))


def test_split_encode_matches_fused(setup):
    """tcfg.encode_outside_step: the separate conditioning-encode program must
    reproduce the fused path (same k_vae fold) up to cross-program fusion
    differences (~1 ULP), so the flagship memory lever cannot drift training
    numerics."""
    bundle, frozen, cn_params = setup
    kw = dict(gradient_checkpointing=False, gradient_accumulation_steps=1,
              use_spatial_loss=False, lr_warmup_steps=0, learning_rate=1e-3,
              use_ema=False)
    t_fused = Trainer(bundle, TrainConfig(**kw), frozen, cn_params, compute_dtype=jnp.float32)
    t_split = Trainer(bundle, TrainConfig(encode_outside_step=True, **kw),
                      frozen, cn_params, compute_dtype=jnp.float32)
    assert "clip" not in t_split.frozen_params  # encoders left the step args
    for _ in range(2):
        m_f = t_fused.step(_batch())
        m_s = t_split.step(_batch())
        np.testing.assert_allclose(float(m_f["loss"]), float(m_s["loss"]), rtol=1e-6)
    lf = jax.tree_util.tree_leaves(t_fused.state.controlnet_params)[0]
    ls = jax.tree_util.tree_leaves(t_split.state.controlnet_params)[0]
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls), atol=1e-5)


def test_grads_bf16_tracks_fp32(setup):
    """tcfg.grads_bf16: cotangents carried in bf16 must keep fp32 master
    params and track the fp32-grad trainer within bf16 rounding after an
    optimizer step (Adam normalizes, so update magnitude ~lr)."""
    bundle, frozen, cn_params = setup
    kw = dict(gradient_checkpointing=False, gradient_accumulation_steps=1,
              use_spatial_loss=False, lr_warmup_steps=0, learning_rate=1e-3,
              use_ema=False)
    t_f32 = Trainer(bundle, TrainConfig(**kw), frozen, cn_params, compute_dtype=jnp.float32)
    t_bf16 = Trainer(bundle, TrainConfig(grads_bf16=True, **kw),
                     frozen, cn_params, compute_dtype=jnp.float32)
    b = _batch()
    m32, mbf = t_f32.step(b), t_bf16.step(b)
    assert np.isfinite(float(mbf["loss"]))
    np.testing.assert_allclose(float(mbf["loss"]), float(m32["loss"]), rtol=2e-2)
    for l32, lbf in zip(jax.tree_util.tree_leaves(t_f32.state.controlnet_params),
                        jax.tree_util.tree_leaves(t_bf16.state.controlnet_params)):
        assert lbf.dtype == l32.dtype  # fp32 masters preserved
        np.testing.assert_allclose(np.asarray(lbf), np.asarray(l32), atol=3e-3)


def test_bf16_accum_matches_multisteps(setup):
    """grad_accum_dtype='bfloat16' (and fp32 as the exactness control): the
    custom accumulation transform follows optax.MultiSteps — updates only on
    sync boundaries, fp32 control bitwise-equal, bf16 within rounding."""
    bundle, frozen, cn_params = setup
    kw = dict(gradient_checkpointing=False, gradient_accumulation_steps=2,
              use_spatial_loss=False, lr_warmup_steps=0, learning_rate=1e-3,
              use_ema=False)
    t_ms = Trainer(bundle, TrainConfig(**kw), frozen, cn_params, compute_dtype=jnp.float32)
    t_f32 = Trainer(bundle, TrainConfig(grad_accum_dtype="float32", **kw),
                    frozen, cn_params, compute_dtype=jnp.float32)
    t_bf16 = Trainer(bundle, TrainConfig(grad_accum_dtype="bfloat16", **kw),
                     frozen, cn_params, compute_dtype=jnp.float32)
    leaf = lambda t: np.asarray(jax.tree_util.tree_leaves(t.state.controlnet_params)[0])
    p0 = leaf(t_ms).copy()
    b1, b2 = _batch(), {k: v + 0.01 for k, v in _batch().items()}
    for t in (t_ms, t_f32, t_bf16):
        t.step(b1)
        np.testing.assert_array_equal(leaf(t), p0)  # micro-step 1: deferred
        t.step(b2)
        assert np.abs(leaf(t) - p0).max() > 0       # sync: applied
    np.testing.assert_array_equal(leaf(t_f32), leaf(t_ms))
    np.testing.assert_allclose(leaf(t_bf16), leaf(t_ms), rtol=0, atol=2e-3)
