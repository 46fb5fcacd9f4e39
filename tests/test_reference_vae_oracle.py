"""Reference-parity oracle for the frozen VAE (AutoencoderKLTemporalDecoder).

The reference does not vendor the VAE — it loads diffusers'
AutoencoderKLTemporalDecoder frozen (train_svd_traj_blender_14.py:880-884) and
drives it chunked in the pipeline (pipeline...controlnet.py:174-195, 225-251).
tests/ref_oracle/diffusers/models/autoencoder_kl_temporal_decoder.py is an
independent torch re-derivation of the 0.24.0 architecture; here we assert:

  * the converter's "vae" name rules cover the torch state_dict exactly
    (key set + shapes both directions), and
  * fp32 forward parity for encode (moments) and decode (frames), covering
    paths the UNet oracle never touches: the per-frame 2D encoder with
    asymmetric-pad downsampling, the residual single-head mid attention, the
    decoder's "learned" AlphaBlender branch (vs the UNet's
    "learned_with_images"), and the final (3,1,1) time_conv_out frame mixer.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

STUB_DIR = os.path.join(os.path.dirname(__file__), "ref_oracle")

TINY_VAE = dict(block_out_channels=(32, 64), layers_per_block=1, latent_channels=4)
B, F, H, W = 1, 2, 16, 16  # pixel space; latent is H/2 x W/2 with 2 blocks


def _vae_cfg():
    from posetraj_tpu.configs import VAEConfig

    return dataclasses.replace(
        VAEConfig(),
        block_out_channels=TINY_VAE["block_out_channels"],
        layers_per_block=TINY_VAE["layers_per_block"],
        latent_channels=TINY_VAE["latent_channels"],
    )


@pytest.fixture(scope="module")
def torch_vae():
    sys.path.insert(0, STUB_DIR)
    try:
        import torch

        from diffusers.models.autoencoder_kl_temporal_decoder import (
            AutoencoderKLTemporalDecoder,
        )

        torch.manual_seed(0)
        vae = AutoencoderKLTemporalDecoder(**TINY_VAE)
        g = torch.Generator().manual_seed(99)
        sd = vae.state_dict()
        for k, v in sd.items():
            if v.ndim == 1 and ("norm" in k or k.endswith("mix_factor")):
                sd[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
            else:
                sd[k] = 0.1 * torch.randn(v.shape, generator=g)
        vae.load_state_dict(sd)
        vae.eval()
        yield torch, vae
    finally:
        sys.path.remove(STUB_DIR)


def test_converter_names_cover_vae_state_dict_exactly(torch_vae):
    from posetraj_tpu.models import vae as vae_m
    from posetraj_tpu.tools.convert_weights import convert_to_torch

    _, vae = torch_vae
    ours = convert_to_torch(vae_m.init_vae(None, _vae_cfg()), "vae")
    theirs = {k: tuple(v.shape) for k, v in vae.state_dict().items()}
    assert set(ours) == set(theirs), (
        sorted(set(theirs) - set(ours))[:10], sorted(set(ours) - set(theirs))[:10])
    for k, v in ours.items():
        assert tuple(v.shape) == theirs[k], (k, v.shape, theirs[k])


@pytest.fixture(scope="module")
def jax_params(torch_vae):
    from posetraj_tpu.models import vae as vae_m
    from posetraj_tpu.tools.convert_weights import convert_to_jax

    _, vae = torch_vae
    sd = {k: v.detach().numpy() for k, v in vae.state_dict().items()}
    return convert_to_jax(sd, vae_m.init_vae(None, _vae_cfg()), "vae")


def test_encode_matches_reference(torch_vae, jax_params):
    import jax.numpy as jnp

    from posetraj_tpu.models import vae as vae_m

    torch, vae = torch_vae
    g = torch.Generator().manual_seed(3)
    x = torch.randn(B * F, 3, H, W, generator=g)

    with torch.no_grad():
        dist = vae.encode(x).latent_dist
        ref_mean = dist.mean.numpy()
        ref_logvar = dist.logvar.numpy()

    mean, logvar = vae_m.encode(
        jax_params["encoder"], _vae_cfg(),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(mean).transpose(0, 3, 1, 2), ref_mean, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(logvar).transpose(0, 3, 1, 2), ref_logvar, atol=2e-4, rtol=2e-3)


def test_decode_matches_reference(torch_vae, jax_params):
    import jax.numpy as jnp

    from posetraj_tpu.models import vae as vae_m

    torch, vae = torch_vae
    cfg = _vae_cfg()
    g = torch.Generator().manual_seed(4)
    z = torch.randn(B * F, cfg.latent_channels, H // cfg.scale_factor, W // cfg.scale_factor, generator=g)

    with torch.no_grad():
        ref = vae.decode(z, num_frames=F).numpy()

    out = vae_m.decode(
        jax_params["decoder"], cfg,
        jnp.asarray(z.numpy().transpose(0, 2, 3, 1)), F, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-4, rtol=2e-3)


def test_decode_mixes_frames_through_time_conv(torch_vae, jax_params):
    """The temporal decoder is NOT per-frame: perturbing frame 0's latent must
    change frame 1's pixels (temporal resnets + time_conv_out)."""
    import jax.numpy as jnp

    from posetraj_tpu.models import vae as vae_m

    cfg = _vae_cfg()
    rng = np.random.RandomState(0)
    z = rng.randn(F, cfg.latent_channels, H // cfg.scale_factor, W // cfg.scale_factor).astype(np.float32)
    z2 = z.copy()
    z2[0] += 1.0

    a = np.asarray(vae_m.decode(jax_params["decoder"], cfg, jnp.asarray(z.transpose(0, 2, 3, 1)), F, jnp.float32))
    b = np.asarray(vae_m.decode(jax_params["decoder"], cfg, jnp.asarray(z2.transpose(0, 2, 3, 1)), F, jnp.float32))
    assert np.abs(a[1] - b[1]).max() > 1e-6
