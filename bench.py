"""Headline benchmark: FULL-pipeline sec/video for the flagship SVD+ControlNet
stack, plus denoise steps/sec/chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Scope matches the reference's per-video wall clock
(pipeline_stable_video_diffusion_controlnet.py:316-599): CLIP image encode +
VAE cond-image encode + 25-step denoise scan + chunked VAE decode, all inside
the one jitted `generate` program. The denoise-only step time is derived from
the delta between a 25-step and a 1-step program (cancelling the shared
encode/decode + dispatch overhead) and reported as a secondary field.

Budget discipline (BENCH_r04 postmortem, rc=124): the driver runs this under
a hard timeout, so everything is ordered by how much it matters to the one
JSON line and sheds load against a wall-clock budget
(POSETRAJ_BENCH_BUDGET_S, default 660 s measured from interpreter start):

  1. warm + measure the 25-step program      -> the primary number
  2. warm + measure the 1-step program       -> denoise/encode split
     (skipped if the remaining budget cannot fit another full compile;
      the split is then estimated from the last committed encode+decode
      time and labeled as such)
  3. print the JSON line, flushed            <- nothing below can lose it
  4. best-effort extras, each budget-gated, failures to stderr only:
     kernel sweep (skip-cached in .sweep_ok.json keyed by ops code hash)
     and the flagship train-step bench (tools/bench_train.py)
  5. sys.exit(0) no matter what the extras did

If the PRIMARY program fails to compile/run, the kernel sweep runs THEN, for
attribution (its original purpose — BENCH_r03 postmortem), and the process
exits nonzero.

Measurement notes for this environment: the TPU is reached through a tunnel
where dispatch is async and only value reads synchronize, so the program
returns a scalar checksum and the clock stops on its fetch.

Baseline (BASELINE.md): <10 s wall-clock for a 14-frame 576x1024 video at 25
Euler-Karras steps on v5e-8; we measure on the visible chips (usually 1) and
report vs_baseline = 10 / sec_per_video.
"""

import functools
import json
import os
import signal
import subprocess
import sys
import time

_T0 = time.perf_counter()  # interpreter-relative start; budget counts from here

_BUDGET_ENV = float(os.environ.get("POSETRAJ_BENCH_BUDGET_S", "660"))
_SENTINEL = "/tmp/posetraj_bench_line_printed"


def _supervise() -> None:
    """Run the real bench as a child with a hard deadline (BENCH_r04
    postmortem twin: a hung TPU tunnel blocks backend init inside a C call
    where no in-process watchdog can fire). The child inherits stdout, so its
    JSON line passes straight through; it touches _SENTINEL right after
    printing. If the child dies or times out before the sentinel exists, the
    supervisor prints an honest failure line — rc is 0 and the driver always
    gets ONE parseable JSON line."""
    try:
        os.unlink(_SENTINEL)
    except OSError:
        pass
    env = dict(os.environ, POSETRAJ_BENCH_CHILD="1")
    child = subprocess.Popen([sys.executable, os.path.abspath(__file__)], env=env)
    try:
        rc = child.wait(timeout=max(_BUDGET_ENV - 20, 60))
    except subprocess.TimeoutExpired:
        child.kill()
        child.wait()
        rc = "timeout"
    if os.path.exists(_SENTINEL):
        sys.exit(0)  # the headline line is already on stdout
    print(json.dumps({
        "metric": "sec/video full pipeline (FAILED: bench child rc=%s before "
                  "printing — most likely TPU tunnel down/hung or compile "
                  "overran the budget)" % rc,
        "value": -1.0,
        "unit": "sec",
        "vs_baseline": 0.0,
        "error": f"bench child {rc}",
    }), flush=True)
    sys.exit(0)


if __name__ == "__main__" and os.environ.get("POSETRAJ_BENCH_CHILD") != "1":
    _supervise()

import jax
import jax.numpy as jnp
import numpy as np

from posetraj_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(min_compile_secs=1.0)

BUDGET_S = float(os.environ.get("POSETRAJ_BENCH_BUDGET_S", "660"))
# Last committed encode+decode time (PERF.md headline table) used only when
# the 1-step program is shed; labeled in the JSON when used.
_ENCODE_DECODE_PRIOR_S = 2.2


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _remaining() -> float:
    return BUDGET_S - _elapsed()


def _log(msg: str) -> None:
    print(f"[bench +{_elapsed():.0f}s] {msg}", file=sys.stderr, flush=True)


def _run_extras(result: dict) -> None:
    """Best-effort extras AFTER the JSON line is out. Each is budget-gated and
    exception-proofed; output goes to stderr (PERF.md records it by hand)."""
    # --- kernel sweep: compile+execute every Pallas dispatch instance at the
    # flagship shapes, skipping instances already proven OK for the current
    # ops code (repo-committed .sweep_ok.json survives host moves, unlike the
    # host-fingerprinted XLA cache).
    try:
        if _remaining() > 120:
            from posetraj_tpu.tools.kernel_sweep import run_sweep

            run_sweep(deadline_s=max(_remaining() - 90, 60))
        else:
            _log("extras: kernel sweep shed (budget)")
    except Exception as e:  # noqa: BLE001
        _log(f"extras: kernel sweep failed: {type(e).__name__}: {str(e)[:400]}")

    # --- flagship train-step bench (reference recipe, start_pretrain.sh).
    # A full train compile is ~200+ s cold; only attempt with real headroom.
    try:
        if _remaining() > 330:
            from posetraj_tpu.tools.bench_train import bench_train_step

            extras = bench_train_step(verbose=True)
            _log(f"extras: train step {json.dumps(extras)}")
        else:
            _log("extras: train-step bench shed (budget); official record lives "
                 "in PERF.md (scripts/bench_train_step.py)")
    except Exception as e:  # noqa: BLE001
        _log(f"extras: train bench failed: {type(e).__name__}: {str(e)[:400]}")


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    from posetraj_tpu.configs import PipelineConfig, SchedulerConfig
    from posetraj_tpu.diffusion import make_schedule
    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models import vae as vae_m
    from posetraj_tpu.pipeline import ModelBundle
    from posetraj_tpu.pipeline.svd_controlnet import added_time_ids_inference, generate

    if on_tpu:
        height, width, frames, steps = 576, 1024, 14, 25
        bundle = ModelBundle()
        # decode_chunk is the reference pipeline's own memory knob
        # (decode_chunk_size); 2 is what fits full-res decode in 16G HBM
        # (7-frame chunks peak ~16.3G in conv temps alone).
        decode_chunk = 2
    else:
        height, width, frames, steps = 64, 64, 2, 2
        bundle = ModelBundle.tiny()
        decode_chunk = 2

    lat_h, lat_w = height // 8, width // 8
    B = 1  # one video (CFG doubles inside)

    # Meta init, then cheap NONZERO fill (tools/fill.py: deterministic
    # small-magnitude pattern, zero-copy views, per-shape device reuse —
    # VERDICT round-2 weak #6 for why nonzero matters, module docstring for
    # why this costs seconds instead of the 115 s the leaf-by-leaf fill did).
    from posetraj_tpu.tools.fill import fill_params

    _log("jax initialized; filling params")
    cast = lambda tree: fill_params(tree, dtype)
    params = {
        "unet": cast(unet_m.init_unet(None, bundle.unet)),
        "controlnet": cast(cn.init_controlnet(None, bundle.controlnet)),
        "vae": cast(vae_m.init_vae(None, bundle.vae)),
        "clip": cast(clip_m.init_clip_vision(None, bundle.clip)),
    }
    jax.block_until_ready(params)
    _log("params on device")

    pcfg = PipelineConfig(
        height=height, width=width, num_frames=frames, num_inference_steps=steps,
        decode_chunk_size=decode_chunk,
    )
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(B, height, width, 3), jnp.float32)
    control = jnp.asarray(rng.rand(B, frames, 8, 8, 3), jnp.float32).repeat(
        height // 8, axis=2).repeat(width // 8, axis=3)  # cheap nonzero fill
    noises = {
        "latents": jnp.asarray(rng.randn(B, frames, lat_h, lat_w, 4), jnp.float32),
        "image_aug": jnp.asarray(rng.randn(B, 8, 8, 3), jnp.float32).repeat(
            height // 8, axis=1).repeat(width // 8, axis=2),
    }
    time_ids = jnp.asarray(np.tile(added_time_ids_inference(pcfg), (B, 1)))

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(params, sigmas, timesteps, k):
        frames_out = generate(
            params, bundle, pcfg, image, control, noises, time_ids,
            sigmas, timesteps, frames,
        )
        return frames_out.sum()  # scalar checksum forces full execution

    def sched_arrays(k):
        s = make_schedule(SchedulerConfig(), k)
        return jnp.asarray(s.sigmas), jnp.asarray(s.timesteps)

    sig_k, t_k = sched_arrays(steps)
    sig_1, t_1 = sched_arrays(1)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        v = float(run(*a, **kw))
        return time.perf_counter() - t0, v

    # ---- primary: the k-step program, warm then measure --------------------
    _log(f"inputs ready; warming {steps}-step program (budget {BUDGET_S:.0f}s)")
    try:
        wk, _ = timed(params, sig_k, t_k, k=steps)
        tk, _ = timed(params, sig_k, t_k, k=steps)
    except Exception:
        # Attribution path: a full-program failure is most often one Pallas
        # instance; sweep now so the artifact names the kernel (r3 postmortem).
        _log("PRIMARY PROGRAM FAILED — running kernel sweep for attribution")
        if on_tpu:
            try:
                from posetraj_tpu.tools.kernel_sweep import run_sweep

                run_sweep(deadline_s=max(_remaining() - 30, 60))
            except Exception as sweep_err:  # noqa: BLE001
                _log(f"attribution sweep: {type(sweep_err).__name__}: {str(sweep_err)[:2000]}")
        raise
    _log(f"warmk={wk:.1f}s tk={tk:.3f}s")

    # ---- secondary: the 1-step program for the denoise/encode split --------
    # Another full compile of the same body; estimate its cost as the k-step
    # compile cost (upper bound: same UNet+CN body, smaller scan) + two runs.
    split = "measured"
    est_1step = max(wk - tk, 30.0) + 2 * max(tk - 0.0, 5.0)
    if _remaining() > est_1step + 30:
        try:
            w1, _ = timed(params, sig_1, t_1, k=1)
            t1, _ = timed(params, sig_1, t_1, k=1)
            _log(f"warm1={w1:.1f}s t1={t1:.3f}s")
        except Exception as e:  # noqa: BLE001
            _log(f"1-step program failed ({type(e).__name__}); estimating split")
            split, t1 = "estimated", None
    else:
        _log(f"1-step program shed (remaining {_remaining():.0f}s < est {est_1step:.0f}s)")
        split, t1 = "estimated", None

    if t1 is not None:
        step_time = max(tk - t1, 1e-9) / (steps - 1)
        encode_decode_sec = max(t1 - step_time, 0.0)
    else:
        encode_decode_sec = _ENCODE_DECODE_PRIOR_S if on_tpu else 0.0
        step_time = max(tk - encode_decode_sec, 1e-9) / steps

    sec_video = tk  # the honest number: full encode + denoise + decode program
    result = {
        "metric": "sec/video full pipeline (14f 576x1024 SVD+ControlNet, 25 Euler-Karras steps, CFG, CLIP+VAE encode+decode)"
        if on_tpu
        else "sec/video full pipeline (tiny smoke config, non-TPU host)",
        "value": round(sec_video, 3),
        "unit": "sec",
        "vs_baseline": round(10.0 / sec_video, 4),
        "denoise_steps_per_sec_per_chip": round(1.0 / step_time, 4),
        "denoise_sec": round(steps * step_time, 4),
        "encode_decode_sec": round(encode_decode_sec, 4),
        "denoise_split": split,
        "n_devices": jax.device_count(),
        "backend": jax.default_backend(),
        "config": f"{height}x{width} f{frames} s{steps} {np.dtype(dtype).name} chunk{decode_chunk}",
    }
    print(json.dumps(result), flush=True)  # THE line — everything below is extra
    try:  # tell the supervisor the line is out (see _supervise)
        open(_SENTINEL, "w").close()
    except OSError:
        pass

    if on_tpu:
        # Watchdog: even a hung extra cannot turn a printed result into rc!=0.
        if hasattr(signal, "alarm"):
            signal.signal(signal.SIGALRM, lambda *_: os._exit(0))
            signal.alarm(max(int(_remaining()), 5))
        _run_extras(result)
    sys.exit(0)


if __name__ == "__main__":
    main()
