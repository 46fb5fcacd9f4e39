"""Capture a device trace of the flagship denoise step and bucket op time.

Runs the full CFG ControlNet+UNet step (the bench.py hot loop) a few times
under jax.profiler, then parses the emitted trace.json.gz and aggregates
device-track event durations by op-name bucket, so kernel work lands where
the milliseconds actually are (PERF.md methodology).

Usage: python scripts/profile_step.py [--out /tmp/ptrace] [--iters 3]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from posetraj_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(min_compile_secs=1.0)


BUCKETS = [
    # (bucket, regex over the trace event name)
    ("pallas attn kernel", r"qkvt_attention|flash"),
    ("pallas attn proj", r"ln_qkvt|out_proj_res"),
    ("pallas mlp", r"_fused_impl|mlp_kernel|geglu"),
    ("pallas groupnorm", r"group_norm|groupnorm|gn_"),
    ("conv", r"convolution|conv_general"),
    ("matmul (xla)", r"dot|einsum"),
    ("copy/layout", r"copy|transpose|bitcast|reshape"),
    ("reduce/softmax", r"reduce|softmax|exponential"),
    ("fusion (xla)", r"fusion|fused"),
]


def bucket_of(name: str) -> str:
    low = name.lower()
    for b, pat in BUCKETS:
        if re.search(pat, low):
            return b
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ptrace")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        from posetraj_tpu.configs import ControlNetConfig, UNetConfig
        from posetraj_tpu.models import controlnet as cn
        from posetraj_tpu.models import unet as unet_m

        dt = jnp.bfloat16
        B, F, H, W = 2, 14, 72, 128
        unet_cfg = UNetConfig()
        cn_cfg = ControlNetConfig()
        cast = lambda tree: jax.tree_util.tree_map(lambda x: x.astype(dt), tree)
        u_params = cast(unet_m.init_unet(None, unet_cfg))
        c_params = cast(cn.init_controlnet(None, cn_cfg))
        sample = jnp.zeros((B, F, H, W, 8), dt)
        clip_emb = jnp.zeros((B, 1, 1024), dt)
        tids = jnp.asarray([[6.0, 128.0, 0.02]] * B, jnp.float32)
        control = jnp.zeros((B, F, H * 8, W * 8, 3), dt)

        @jax.jit
        def full_step(u_params, c_params, sample):
            down, mid = cn.controlnet_forward(
                c_params, cn_cfg, sample, -1.0, clip_emb, tids,
                controlnet_cond=control, compute_dtype=dt)
            return unet_m.unet_forward(
                u_params, unet_cfg, sample, -1.0, clip_emb, tids, down, mid,
                compute_dtype=dt)

        out = full_step(u_params, c_params, sample)
        float(jnp.sum(out))  # warm (compile + first exec through the tunnel)
        jax.profiler.start_trace(args.out)
        for _ in range(args.iters):
            out = full_step(u_params, c_params, sample)
        float(jnp.sum(out))
        jax.profiler.stop_trace()

    # ---- parse trace.json.gz ----
    paths = sorted(glob.glob(os.path.join(args.out, "**", "*trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz found under", args.out)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device tracks: pick pids whose process name mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc_names.items()
                if re.search(r"tpu|device|/device", n.lower())}
    if not dev_pids:  # fall back: every pid that has X events
        dev_pids = {e["pid"] for e in events if e.get("ph") == "X"}

    per_op = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("$", "process_", "jit_")):
            continue  # jit_* is the parent program event enclosing the ops
        dur = e.get("dur", 0) / 1e6 / max(args.iters, 1)  # us -> s, per-iter
        per_op[name] += dur
        per_bucket[bucket_of(name)] += dur
        total += dur

    print(f"\n== buckets (per-iter device seconds; total {total*1e3:.1f} ms) ==")
    for b, t in per_bucket.most_common():
        print(f"  {b:24s} {t*1e3:9.2f} ms  {100*t/max(total,1e-12):5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for name, t in per_op.most_common(args.top):
        print(f"  {t*1e3:9.2f} ms  {name[:140]}")


if __name__ == "__main__":
    main()
