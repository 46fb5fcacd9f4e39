from posetraj_tpu.core import init, params  # noqa: F401
