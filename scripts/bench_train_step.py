"""Time the flagship training step on the attached TPU (VERDICT r3 #6).

Prints one JSON line with sec/step (grad-accum micro-step), compiled per-chip
HBM accounting, and the loss. Reference recipe anchor: start_pretrain.sh:1-19
(320x576, bs 1, accum 2, fp16/grad-ckpt — here bf16 + bf16 Adam moments)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posetraj_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(min_compile_secs=1.0)

from posetraj_tpu.tools.bench_train import bench_train_step

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()
    import jax

    tiny = args.tiny or jax.default_backend() != "tpu"
    kw = dict(height=64, width=64, frames=2) if tiny else {}
    print(json.dumps(bench_train_step(iters=args.iters, tiny=tiny, **kw)))
