from diffusers.pipelines.pipeline_utils import DiffusionPipeline  # noqa: F401
