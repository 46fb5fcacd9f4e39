"""jax.distributed CPU worker: one process of a multi-controller training run.

Driven by tests/test_multiprocess.py (VERDICT round-2 next #4): N of these
processes form a real jax.distributed pod on localhost — the same contract as
a Cloud TPU pod slice (one process per host, local devices each, global mesh)
and the TPU-native equivalent of the reference's `accelerate launch`
multi-process bootstrap (train_svd_traj_blender_14.py:821-827). Each process
feeds its PrefetchLoader slice of the global batch through Trainer._globalize
(jax.make_array_from_process_local_data) and steps the sharded trainer; the
losses must match a single-process run over the same global batches exactly.

Run standalone:
    python tests/helpers/distributed_worker.py --coordinator localhost:9876 \
        --num_processes 2 --process_id 0 --out /tmp/p0.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Invoked as a script: sys.path[0] is tests/helpers, not the repo root the
# posetraj_tpu package is imported from.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def make_dataset(n: int, h: int = 64, w: int = 64, f: int = 2):
    import numpy as np

    class SyntheticDataset:
        """Deterministic per-index samples (content independent of process)."""

        def __len__(self):
            return n

        def __getitem__(self, i):
            rs = np.random.RandomState(1000 + i)
            return {
                "pixel_values": (rs.rand(f, h, w, 3) * 2 - 1).astype(np.float32),
                "trajectories": (rs.rand(f, h, w, 3) * 2 - 1).astype(np.float32),
                "motion_values": np.float32(127.0),
            }

    return SyntheticDataset()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None, help="host:port of process 0")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--local_devices", type=int, default=2,
                    help="CPU devices per process (global = N * this)")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", required=True, help="JSON result path (all processes write)")
    args = ap.parse_args(argv)

    import jax

    # Fresh interpreter: sitecustomize pins the axon TPU platform via env, so
    # the platform must be overridden through jax.config before any device use.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    # Persistent compile cache: the env var is only read at jax import time,
    # so it MUST go through jax.config here (same cache as tests/conftest.py —
    # the sharded train step is identical HLO across worker topologies).
    from posetraj_tpu.utils.compile_cache import (
        setup_compile_cache,
        setup_cpu_collective_timeouts,
    )

    setup_cpu_collective_timeouts()
    setup_compile_cache(min_compile_secs=1.0)

    if args.num_processes > 1:
        from posetraj_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes, args.process_id)
        assert jax.process_count() == args.num_processes, jax.process_count()

    import jax.numpy as jnp

    from posetraj_tpu.configs import TrainConfig
    from posetraj_tpu.data.datasets import PrefetchLoader
    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models import vae as vae_m
    from posetraj_tpu.parallel import make_mesh
    from posetraj_tpu.pipeline import ModelBundle
    from posetraj_tpu.train import Trainer

    n_dev = jax.device_count()  # global across processes
    mesh = make_mesh(n_data=n_dev, n_model=1)

    if args.num_processes > 1:
        # Establish the Gloo full-mesh contexts NOW, while the processes are
        # seconds apart: this trivial all-reduce compiles instantly on every
        # process, so all ranks hit the rendezvous together. The first real
        # train step must NOT be the first collective — its multi-minute
        # single-core compile can skew the processes past Gloo's 30 s
        # key-value timeout ("Gloo context initialization failed:
        # DEADLINE_EXCEEDED ... GetKeyValue() timed out").
        from jax.sharding import NamedSharding, PartitionSpec

        probe = jax.device_put(
            jnp.arange(n_dev, dtype=jnp.float32),
            NamedSharding(mesh, PartitionSpec("data")),
        )
        expect = n_dev * (n_dev - 1) / 2
        assert float(jnp.sum(probe)) == expect, "warmup all-reduce"

    bundle = ModelBundle.tiny()
    key = jax.random.PRNGKey(0)
    frozen = {
        "unet": unet_m.init_unet(key, bundle.unet),
        "vae": vae_m.init_vae(key, bundle.vae),
        "clip": clip_m.init_clip_vision(key, bundle.clip),
    }
    cn_params = cn.init_controlnet(jax.random.PRNGKey(1), bundle.controlnet)
    tcfg = TrainConfig(gradient_accumulation_steps=1, lr_warmup_steps=0,
                       gradient_checkpointing=False, conditioning_dropout_prob=0.0)
    trainer = Trainer(bundle, tcfg, frozen, cn_params, mesh=mesh,
                      compute_dtype=jnp.float32)

    global_batch = n_dev
    dataset = make_dataset(n=2 * global_batch)
    loader = PrefetchLoader(
        dataset, global_batch, num_workers=2,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    losses = []
    try:
        for batch in loader.epoch(seed=7):
            metrics = trainer.step(batch)
            losses.append(float(metrics["loss"]))
            if len(losses) >= args.steps:
                break
    finally:
        loader.close()

    with open(args.out, "w") as f:
        json.dump({
            "process_id": args.process_id,
            "process_count": jax.process_count(),
            "global_devices": n_dev,
            "losses": losses,
        }, f)
    print(f"process {args.process_id}/{args.num_processes}: losses={losses}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
