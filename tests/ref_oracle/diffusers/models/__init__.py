"""models subpackage of the test-only diffusers stand-in (see package
docstring): faithful torch implementations of the 0.24.0 SVD building blocks
so the reference's model files execute verbatim as parity oracles."""


class UNetSpatioTemporalConditionModel:  # import-only type hint target
    """controlnet_sdv.py imports this solely to annotate from_unet(unet=...);
    the oracle tests pass the reference's own ControlNet-consumer UNet (whose
    encoder attributes are identical) instead."""


from diffusers.models.autoencoder_kl_temporal_decoder import (  # noqa: E402,F401
    AutoencoderKLTemporalDecoder,
)
