"""Microbenchmark for the Pallas flash-attention kernel on the live TPU.

Times the three spatial-attention shapes of the 576x1024 f14 CFG workload
(SURVEY.md 3.4; B*F = 28):

  L0: S = 72*128 = 9216, heads 5   -> fold 140
  L1: S = 36*64  = 2304, heads 10  -> fold 280
  L2: S = 18*32  =  576, heads 20  -> fold 560

Measurement style per NOTES.md: the tunnel dispatches asynchronously and only
value reads synchronize, so each sample chains `iters` dependent-free calls
and stops the clock on a scalar fetch.

Usage: python scripts/bench_attention.py [--blocks 512,1024 1024,1024 ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from posetraj_tpu.ops.attention import _xla_attention
from posetraj_tpu.ops.pallas_attention import flash_attention, flash_attention_tq

SHAPES = [  # (name, fold_batch, seq, heads_folded=1, head_dim)
    ("L0 S=9216", 140, 9216, 64),
    ("L1 S=2304", 280, 2304, 64),
    ("L2 S=576", 560, 576, 64),
]


def time_call(fn, args, iters=8):
    out = fn(*args)
    float(jnp.sum(out))  # sync after compile+warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", nargs="*", default=["512,1024"],
                    help="list of block_q,block_k pairs to sweep")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--kernel", choices=["nat", "tq", "xla", "both"], default="both",
                    help="natural layout, transposed-accumulator, or both")
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    for name, bn, s, h in SHAPES:
        q = jax.random.normal(key, (bn, s, 1, h), jnp.bfloat16)
        k = jax.random.normal(key, (bn, s, 1, h), jnp.bfloat16)
        v = jax.random.normal(key, (bn, s, 1, h), jnp.bfloat16)
        flops = 4.0 * bn * s * s * h
        kernels = {"nat": flash_attention, "tq": flash_attention_tq,
                   "xla": lambda q, k, v, scale, block_q, block_k: _xla_attention(q, k, v, scale)}
        wanted = ["nat", "tq"] if args.kernel == "both" else [args.kernel]
        for pair in args.blocks:
            bq, bk = (int(x) for x in pair.split(","))
            for kname in wanted:
                fn = kernels[kname]
                try:
                    t = time_call(
                        lambda q, k, v, fn=fn: fn(q, k, v, scale=h**-0.5, block_q=bq, block_k=bk),
                        (q, k, v), iters=args.iters,
                    )
                except Exception as e:  # noqa: BLE001 - sweep over possibly-invalid configs
                    print(f"{name} {kname} bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:120]}")
                    continue
                print(f"{name} {kname} bq={bq} bk={bk}: {t*1e3:.2f} ms  {flops/t/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
