"""PoseTraj-TPU: a TPU-native trajectory-conditioned image-to-video framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of PoseTraj (CVPR 2025,
robingg1/PoseTraj): Stable-Video-Diffusion img2vid-14 with a spatio-temporal
trajectory ControlNet, EDM training, Euler-Discrete-Karras sampling, 3D-bbox /
camera-disentanglement / rot-id / entity / temporal hint-encoder variants, and a
pjit-sharded trainer + batched-serving pipeline.

Design: pure-functional modules over parameter pytrees (no framework layer),
channels-last (NHWC) tensor layout, bf16 compute with fp32 parameters/norms,
`lax.scan`-compiled denoise loop, `jax.sharding.Mesh` parallelism, and Pallas
kernels for the attention hot paths.
"""

__version__ = "0.1.0"

from posetraj_tpu.configs import (  # noqa: F401
    EDMConfig,
    UNetConfig,
    ControlNetConfig,
    VAEConfig,
    CLIPVisionConfig,
    SchedulerConfig,
    PipelineConfig,
    TrainConfig,
    DTypePolicy,
)


def load_pipeline(checkpoint=None, svd_root=None, variant="base", tiny=False):
    """Convenience: build an SVDControlNetPipeline from converted checkpoints
    (see posetraj_tpu.inference.build_pipeline)."""
    from posetraj_tpu.inference import build_pipeline

    return build_pipeline(checkpoint, svd_root, variant, tiny)
