from posetraj_tpu.models import embeddings, resnet, transformer, blocks, unet, controlnet, vae, clip  # noqa: F401
