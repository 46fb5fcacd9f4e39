from posetraj_tpu.pipeline.svd_controlnet import (  # noqa: F401
    SVDControlNetPipeline,
    ModelBundle,
    generate,
)
