from posetraj_tpu.train.trainer import (  # noqa: F401
    TrainState,
    Trainer,
    edm_training_loss,
    encode_image_clip_train,
    make_train_step,
)
