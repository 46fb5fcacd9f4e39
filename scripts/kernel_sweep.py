"""Run the TPU kernel compile sweep standalone (see tools/kernel_sweep.py).

Exit code 0 = every Pallas kernel instance the flagship programs dispatch
compiles AND executes on the attached TPU at its real shapes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posetraj_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(min_compile_secs=1.0)

from posetraj_tpu.tools.kernel_sweep import run_sweep

if __name__ == "__main__":
    run_sweep()
