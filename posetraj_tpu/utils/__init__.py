from posetraj_tpu.utils.profiling import StageTimer, trace  # noqa: F401
from posetraj_tpu.utils.metrics import MetricsLogger  # noqa: F401
