"""Reference-parity oracle for the MODEL layer: execute the reference repo's
OWN model files (models/unet_spatio_temporal_condition_controlnet.py,
models/controlnet_sdv.py) in torch and assert our JAX rebuild matches.

Like tests/test_reference_scheduler_oracle.py, the reference code runs on the
test-only diffusers stand-in (tests/ref_oracle/diffusers/ — faithful torch
implementations of the 0.24.0 SVD building blocks). This upgrades model parity
from "round-trip-consistent converter + self-consistency goldens" to
"reference code executed against ours on the same randomized weights":

  * converter name rules are validated against a REAL state_dict emitted by
    the reference's own module tree (every key must round-trip exactly), and
  * forward parity covers the full ControlNet -> residuals -> UNet composed
    step at fp32, including the Q1 in-loop residual quirk the reference's
    forward wiring produces (unet...controlnet.py:451-459).

What this cannot prove offline (no network, no released weights): agreement
with the *trained* SVD checkpoint's config.json constants — covered separately
by tools/hub_configs.verify_checkpoint once weights are obtainable.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/models"
STUB_DIR = os.path.join(os.path.dirname(__file__), "ref_oracle")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available"
)

TINY = dict(
    block_out_channels=(32, 64, 64, 64),
    num_attention_heads=(2, 4, 4, 4),
    cross_attention_dim=16,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24,
    num_frames=2,
)
HINT_CHANNELS = (4, 8, 8, 16)
B, F, H, W = 2, 2, 8, 8  # latent h/w; control video is 8x bigger


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_models():
    sys.path.insert(0, STUB_DIR)
    try:
        import torch

        unet_mod = _load_ref("ref_unet_oracle", os.path.join(REF_DIR, "unet_spatio_temporal_condition_controlnet.py"))
        cn_mod = _load_ref("ref_cn_oracle", os.path.join(REF_DIR, "controlnet_sdv.py"))
        torch.manual_seed(0)
        unet = unet_mod.UNetSpatioTemporalConditionControlNetModel(**TINY)
        cnet = cn_mod.ControlNetSDVModel.from_unet(
            unet, conditioning_embedding_out_channels=HINT_CHANNELS
        )
        # Randomize EVERY weight (including the zero-convs, which would
        # otherwise hide the whole residual path) with shared deterministic
        # values; norms get scales near 1 to stay numerically sane.
        g = torch.Generator().manual_seed(1234)
        sd = cnet.state_dict()
        for k, v in sd.items():
            if v.ndim == 1 and ("norm" in k or k.endswith("mix_factor")):
                sd[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
            else:
                sd[k] = 0.1 * torch.randn(v.shape, generator=g)
        cnet.load_state_dict(sd)
        usd = unet.state_dict()
        for k, v in usd.items():
            if v.ndim == 1 and ("norm" in k or k.endswith("mix_factor")):
                usd[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
            else:
                usd[k] = 0.1 * torch.randn(v.shape, generator=g)
        unet.load_state_dict(usd)
        unet.eval()
        cnet.eval()
        yield torch, unet, cnet
    finally:
        sys.path.remove(STUB_DIR)


@pytest.fixture(scope="module")
def inputs(torch_models):
    torch, _, _ = torch_models
    g = torch.Generator().manual_seed(7)
    return {
        "sample": torch.randn(B, F, 8, H, W, generator=g),
        "t": torch.tensor([0.25] * B),
        "clip": torch.randn(B, 1, TINY["cross_attention_dim"], generator=g),
        "time_ids": torch.tensor([[6.0, 127.0, 0.02]] * B),
        "control": torch.randn(B, F, 3, H * 8, W * 8, generator=g),
    }


def _jax_params(torch_model, template, model_name):
    from posetraj_tpu.tools.convert_weights import convert_to_jax

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return convert_to_jax(sd, template, model_name), sd


def _bundle():
    from posetraj_tpu.configs import ControlNetConfig, HintEncoderConfig, UNetConfig

    u = UNetConfig(**{k: v for k, v in TINY.items()})
    c = ControlNetConfig(unet=u, hint=__import__("dataclasses").replace(
        HintEncoderConfig(), block_out_channels=HINT_CHANNELS, embedding_channels=u.block_out_channels[0]
    ))
    return u, c


def test_converter_names_cover_reference_state_dict_exactly(torch_models):
    """Every converter-emitted torch name must exist in the reference's own
    state_dict and vice versa (VERDICT weak #4: name rules vs a real tree)."""
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.tools.convert_weights import convert_to_torch

    _, unet, cnet = torch_models
    u_cfg, c_cfg = _bundle()

    ours = convert_to_torch(unet_m.init_unet(None, u_cfg), "unet")
    theirs = {k: tuple(v.shape) for k, v in unet.state_dict().items()}
    assert set(ours) == set(theirs), (
        sorted(set(theirs) - set(ours))[:10], sorted(set(ours) - set(theirs))[:10])
    for k, v in ours.items():
        assert tuple(v.shape) == theirs[k], (k, v.shape, theirs[k])

    ours = convert_to_torch(cn.init_controlnet(None, c_cfg), "controlnet")
    theirs = {k: tuple(v.shape) for k, v in cnet.state_dict().items()}
    assert set(ours) == set(theirs), (
        sorted(set(theirs) - set(ours))[:10], sorted(set(ours) - set(theirs))[:10])
    for k, v in ours.items():
        assert tuple(v.shape) == theirs[k], (k, v.shape, theirs[k])


def test_unet_forward_matches_reference(torch_models, inputs):
    """Pure UNet parity (zero residuals: the reference forward has no
    None-residual path — it always consumes ControlNet outputs)."""
    import jax.numpy as jnp
    import torch

    from posetraj_tpu.models import unet as unet_m

    _, unet, cnet = torch_models
    u_cfg, _ = _bundle()
    params, _ = _jax_params(unet, unet_m.init_unet(None, u_cfg), "unet")

    with torch.no_grad():
        zero_down, zero_mid = cnet(
            inputs["sample"], inputs["t"][0], inputs["clip"], inputs["time_ids"],
            controlnet_cond=inputs["control"], conditioning_scale=0.0, return_dict=False,
        )
        assert all(float(d.abs().max()) == 0.0 for d in zero_down)
        ref = unet(
            inputs["sample"], inputs["t"][0], inputs["clip"],
            down_block_additional_residuals=zero_down, mid_block_additional_residual=zero_mid,
            added_time_ids=inputs["time_ids"], return_dict=False,
        )[0].numpy()

    sample = jnp.asarray(inputs["sample"].numpy().transpose(0, 1, 3, 4, 2))
    out = unet_m.unet_forward(
        params, u_cfg, sample, float(inputs["t"][0]),
        jnp.asarray(inputs["clip"].numpy()), jnp.asarray(inputs["time_ids"].numpy()),
        compute_dtype=jnp.float32,
    )
    out = np.asarray(out).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_controlnet_forward_matches_reference(torch_models, inputs):
    import jax.numpy as jnp
    import torch

    from posetraj_tpu.models import controlnet as cn

    _, _, cnet = torch_models
    _, c_cfg = _bundle()
    params, _ = _jax_params(cnet, cn.init_controlnet(None, c_cfg), "controlnet")

    with torch.no_grad():
        ref_down, ref_mid = cnet(
            inputs["sample"], inputs["t"][0], inputs["clip"], inputs["time_ids"],
            controlnet_cond=inputs["control"], return_dict=False,
        )

    sample = jnp.asarray(inputs["sample"].numpy().transpose(0, 1, 3, 4, 2))
    control = jnp.asarray(inputs["control"].numpy().transpose(0, 1, 3, 4, 2))
    down, mid = cn.controlnet_forward(
        params, c_cfg, sample, float(inputs["t"][0]),
        jnp.asarray(inputs["clip"].numpy()), jnp.asarray(inputs["time_ids"].numpy()),
        controlnet_cond=control, compute_dtype=jnp.float32,
    )
    assert len(down) == len(ref_down)
    for i, (ours, ref) in enumerate(zip(down, ref_down)):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=2e-4, rtol=2e-3,
            err_msg=f"down residual {i}",
        )
    np.testing.assert_allclose(
        np.asarray(mid).transpose(0, 3, 1, 2), ref_mid.numpy(), atol=2e-4, rtol=2e-3
    )


def test_composed_denoise_step_matches_reference(torch_models, inputs):
    """ControlNet -> UNet with residuals, exercising the reference forward's
    Q1 in-loop residual accumulation (unet...controlnet.py:451-459)."""
    import jax.numpy as jnp
    import torch

    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m

    _, unet, cnet = torch_models
    u_cfg, c_cfg = _bundle()
    assert u_cfg.fidelity_residual_in_loop
    u_params, _ = _jax_params(unet, unet_m.init_unet(None, u_cfg), "unet")
    c_params, _ = _jax_params(cnet, cn.init_controlnet(None, c_cfg), "controlnet")

    with torch.no_grad():
        down, mid = cnet(
            inputs["sample"], inputs["t"][0], inputs["clip"], inputs["time_ids"],
            controlnet_cond=inputs["control"], conditioning_scale=0.7, return_dict=False,
        )
        ref = unet(
            inputs["sample"], inputs["t"][0], inputs["clip"],
            down_block_additional_residuals=down, mid_block_additional_residual=mid,
            added_time_ids=inputs["time_ids"], return_dict=False,
        )[0].numpy()

    sample = jnp.asarray(inputs["sample"].numpy().transpose(0, 1, 3, 4, 2))
    control = jnp.asarray(inputs["control"].numpy().transpose(0, 1, 3, 4, 2))
    j_down, j_mid = cn.controlnet_forward(
        c_params, c_cfg, sample, float(inputs["t"][0]),
        jnp.asarray(inputs["clip"].numpy()), jnp.asarray(inputs["time_ids"].numpy()),
        controlnet_cond=control, conditioning_scale=0.7, compute_dtype=jnp.float32,
    )
    out = unet_m.unet_forward(
        u_params, u_cfg, sample, float(inputs["t"][0]),
        jnp.asarray(inputs["clip"].numpy()), jnp.asarray(inputs["time_ids"].numpy()),
        down_block_residuals=j_down, mid_block_residual=j_mid,
        compute_dtype=jnp.float32,
    )
    out = np.asarray(out).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=2e-3)
