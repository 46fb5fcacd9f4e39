from posetraj_tpu.ops.primitives import (  # noqa: F401
    linear,
    conv2d,
    conv3d_temporal,
    group_norm,
    layer_norm,
    silu,
    gelu,
    geglu,
    downsample_2x,
    upsample_nearest_2x,
)
from posetraj_tpu.ops.attention import attention  # noqa: F401
