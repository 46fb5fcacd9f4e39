"""Training CLI: stage-1 Blender pretrain / stage-2 VIPSeg finetune / camera
finetune as one entry point.

Replaces the reference's accelerate-launched script trio + shell configs
(start_pretrain.sh / start_ft.sh / start_ft_cam.sh; SURVEY.md 2.16, 2.21):

    python -m posetraj_tpu.train.cli --stage pretrain --video_folder <10k> \
        --output_dir out/ [--images_bbox]
    python -m posetraj_tpu.train.cli --stage ft --video_folder <vipseg> \
        --split_file train.txt --controlnet_init out/checkpoint-50000
    python -m posetraj_tpu.train.cli --stage ft_cam ... --cam_path <4dhumans> \
        --cam_mask_ratio 0.5

Writes: checkpoints (checkpoint-<step>/ with ControlNet + EMA + optimizer,
rotated), rec_para.txt parameter audit (train...blender_14.py:1029-1038),
metrics JSONL (+TensorBoard), validation side-by-side GIFs every
--validation_steps (:1418-1495).
"""

from __future__ import annotations

import argparse
import os

def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", choices=["pretrain", "ft", "ft_cam"], required=True)
    p.add_argument("--video_folder", required=True)
    p.add_argument("--split_file", default=None, help="VIPSeg train split (ft stages)")
    p.add_argument("--output_dir", default="runs/posetraj")
    p.add_argument("--svd_root", default=None, help="converted SVD weights dir; random init if absent")
    p.add_argument("--controlnet_init", default=None, help="checkpoint dir to init the ControlNet from")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--per_device_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--num_train_epochs", type=int, default=6)
    p.add_argument("--max_train_steps", type=int, default=0)
    p.add_argument("--checkpointing_steps", type=int, default=10000)
    p.add_argument("--checkpoints_total_limit", type=int, default=2)
    p.add_argument("--validation_steps", type=int, default=2500)
    p.add_argument("--validation_folder", default=None,
                   help="held-out video folder (same layout as --video_folder) for "
                        "validation renders — the reference validates from a dedicated "
                        "directory (train_svd_traj_blender_14.py:740-748); falls back "
                        "to training samples if absent")
    p.add_argument("--validation_split_file", default=None,
                   help="VIPSeg val split list (ft stages); default <folder>/val.txt")
    p.add_argument("--num_validation_samples", type=int, default=2,
                   help="videos rendered per validation pass "
                        "(reference --num_validation_images)")
    p.add_argument("--num_inference_steps", type=int, default=25,
                   help="denoise steps for validation renders")
    p.add_argument("--conditioning_dropout_prob", type=float, default=0.1)
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--num_workers", type=int, default=8,
                   help="prefetch loader threads (reference DataLoader num_workers=8)")
    p.add_argument("--images_bbox", action="store_true", help="stage-1 bbox-composited targets")
    p.add_argument("--bbox_supervision", action="store_true",
                   help="stage-1 dual-branch bbox ControlNet: rendered 3D-bbox wireframe "
                        "maps feed the second hint branch (controlnet_sdv_bbox.py:95-136; "
                        "BASELINE configs[2])")
    p.add_argument("--filter_num", type=int, default=-1)
    p.add_argument("--cut_num", type=int, default=-1)
    p.add_argument("--cam_path", default=None)
    p.add_argument("--cam_mask_ratio", type=float, default=0.5)
    p.add_argument("--cam_norm", action="store_true")
    p.add_argument("--rasterizer", default="cv2", choices=("cv2", "native", "auto"),
                   help="host trajectory rasterizer: cv2 = exact reference parity "
                        "(quirk Q5); native = dependency-free C++ kernel for TPU "
                        "hosts (posetraj_tpu/native); auto = native when built")
    p.add_argument("--seed", type=int, default=23123134)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host pod run: call jax.distributed.initialize before device use")
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (auto-detected on Cloud TPU pods)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--n_model_shards", type=int, default=1)
    p.add_argument("--no_gradient_checkpointing", action="store_true")
    # Single-chip 16 GB HBM levers (TrainConfig docstrings; tools/bench_train.py
    # measures the flagship step with all three on).
    p.add_argument("--adam_mu_bf16", action="store_true",
                   help="bf16 Adam moments (stands in for the reference's --use_8bit_adam)")
    p.add_argument("--grad_accum_dtype", default=None, choices=(None, "float32", "bfloat16"),
                   help="storage dtype of the grad-accumulation buffer (default: optax fp32)")
    p.add_argument("--encode_outside_step", action="store_true",
                   help="run frozen VAE/CLIP conditioning encodes as a separate jitted program")
    p.add_argument("--grads_bf16", action="store_true",
                   help="carry cotangents in bf16 (fp32 masters stay in the optimizer)")
    p.add_argument("--tiny", action="store_true", help="tiny model bundle (smoke runs)")
    p.add_argument("--platform", choices=["default", "cpu"], default="default",
                   help="force the jax platform (sitecustomize pins the tunneled "
                        "TPU regardless of JAX_PLATFORMS; CPU smoke runs need this)")
    return p.parse_args(argv)


def build_dataset(args, root: str = None, split_file: str = None):
    """Training dataset by default; pass `root` (+ optional `split_file`) to
    build the held-out validation dataset over a different folder with the
    same stage-specific layout."""
    from posetraj_tpu.data import TrajectoryBlenderDataset, TrajectoryVIPSegDataset

    root = root or args.video_folder
    size = (args.height, args.width)
    if args.stage == "pretrain":
        return TrajectoryBlenderDataset(
            root, sample_size=size, frame_length=args.num_frames,
            images_bbox=args.images_bbox, return_bbox=args.bbox_supervision,
            filter_num=args.filter_num, cut_num=args.cut_num, seed=args.seed,
        )
    split = split_file or args.split_file or os.path.join(root, "train.txt")
    return TrajectoryVIPSegDataset(
        root, split, sample_size=size, frame_length=args.num_frames,
        return_cam=(args.stage == "ft_cam"), camera_path=args.cam_path,
        cam_mask_ratio=args.cam_mask_ratio if args.stage == "ft_cam" else 0.0,
        cam_norm=args.cam_norm, rasterizer=args.rasterizer, seed=args.seed,
    )


def main(argv=None):
    args = parse_args(argv)
    if args.distributed:
        # Must run before any other jax use on every process of the pod — the
        # accelerate-launch equivalent (train...blender_14.py:821-827).
        from posetraj_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(args.coordinator_address, args.num_processes, args.process_id)
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from posetraj_tpu.configs import TrainConfig
    from posetraj_tpu.core.params import count_params, param_audit
    from posetraj_tpu.data.datasets import PrefetchLoader, epoch_batches
    from posetraj_tpu.models import clip as clip_m
    from posetraj_tpu.models import controlnet as cn
    from posetraj_tpu.models import unet as unet_m
    from posetraj_tpu.models import vae as vae_m
    from posetraj_tpu.parallel import make_mesh
    from posetraj_tpu.pipeline import ModelBundle
    from posetraj_tpu.train import Trainer
    from posetraj_tpu.train import checkpoints as ckpt
    from posetraj_tpu.utils import MetricsLogger

    if args.stage == "ft_cam":
        variant = "cam"
    elif args.bbox_supervision:
        variant = "bbox"
    else:
        variant = "base"
    bundle = ModelBundle.tiny(variant) if args.tiny else ModelBundle.with_variant(variant)

    key = jax.random.PRNGKey(args.seed)
    frozen = {
        "unet": unet_m.init_unet(key if args.svd_root is None else None, bundle.unet),
        "vae": vae_m.init_vae(key if args.svd_root is None else None, bundle.vae),
        "clip": clip_m.init_clip_vision(key if args.svd_root is None else None, bundle.clip),
    }
    if args.svd_root:
        from posetraj_tpu.tools.convert_weights import convert_to_jax, load_diffusers_model_dir

        for name in ("unet", "vae", "clip"):
            sub = {"unet": "unet", "vae": "vae", "clip": "image_encoder"}[name]
            frozen[name] = convert_to_jax(
                load_diffusers_model_dir(os.path.join(args.svd_root, sub)), frozen[name], name
            )

    cn_params = cn.init_controlnet(jax.random.PRNGKey(args.seed + 1), bundle.controlnet)
    # from_unet weight copy for fresh ControlNets (controlnet_sdv.py:698-707)
    cn_params = cn.controlnet_from_unet(cn_params, frozen["unet"])
    if args.controlnet_init:
        from posetraj_tpu.tools.convert_weights import convert_to_jax, load_diffusers_model_dir

        cn_params = convert_to_jax(
            load_diffusers_model_dir(args.controlnet_init), cn_params, "controlnet"
        )

    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        per_device_batch_size=args.per_device_batch_size,
        num_frames=args.num_frames,
        height=args.height,
        width=args.width,
        conditioning_dropout_prob=args.conditioning_dropout_prob,
        use_ema=args.use_ema,
        cam_mask_ratio=args.cam_mask_ratio,
        cam_norm=args.cam_norm,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        seed=args.seed,
        gradient_checkpointing=not args.no_gradient_checkpointing,
        adam_mu_bf16=args.adam_mu_bf16,
        grad_accum_dtype=args.grad_accum_dtype,
        encode_outside_step=args.encode_outside_step,
        grads_bf16=args.grads_bf16,
    )

    n_dev = jax.device_count()  # global across all processes
    mesh = make_mesh(n_data=n_dev // args.n_model_shards, n_model=args.n_model_shards) if n_dev > 1 else None
    trainer = Trainer(bundle, tcfg, frozen, cn_params, mesh=mesh)

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "rec_para.txt"), "w") as f:
        f.write(f"controlnet (trainable): {count_params(cn_params):,} params\n")
        f.write(f"frozen: {sum(count_params(v) for v in frozen.values()):,} params\n\n")
        f.write(param_audit(cn_params))
    logger = MetricsLogger(args.output_dir)

    if args.resume_from_checkpoint:
        path = (
            ckpt.latest_checkpoint(args.output_dir)
            if args.resume_from_checkpoint == "latest"
            else args.resume_from_checkpoint
        )
        if path:
            trainer.state = ckpt.restore_checkpoint(path, trainer.state)
            print(f"resumed from {path} at step {int(trainer.state.step)}")

    dataset = build_dataset(args)
    if args.validation_folder:
        val_split = args.validation_split_file or (
            None if args.stage == "pretrain"
            else os.path.join(args.validation_folder, "val.txt")
        )
        val_dataset = build_dataset(args, root=args.validation_folder, split_file=val_split)
        if hasattr(val_dataset, "cam_mask_ratio"):
            val_dataset.cam_mask_ratio = 0.0  # no random cam dropout at eval
    else:
        # Reference behavior is a dedicated held-out folder; rendering train
        # samples cannot reveal overfitting — warn but stay usable.
        print("WARNING: no --validation_folder; validation renders use TRAINING samples")
        val_dataset = dataset
    global_batch = args.per_device_batch_size * (mesh.shape["data"] if mesh else 1)
    loader = PrefetchLoader(
        dataset, global_batch, num_workers=args.num_workers,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    step = int(trainer.state.step)
    print(f"dataset: {len(dataset)} samples; global batch {global_batch}; "
          f"devices {n_dev}; processes {jax.process_count()}")

    def run_validation(current_step: int):
        """Render held-out samples (val_dataset, --validation_folder) with the
        in-training ControlNet and save side-by-side GIFs (the reference's
        eyeball-validation loop, train_svd_traj_blender_14.py:1418-1495)."""
        from posetraj_tpu.data import export
        from posetraj_tpu.pipeline import SVDControlNetPipeline

        val_params = {
            "unet": frozen["unet"],
            "vae": frozen["vae"],
            "clip": frozen["clip"],
            "controlnet": (
                trainer.state.ema_params if trainer.state.ema_params is not None
                else trainer.state.controlnet_params
            ),
        }
        pipe = SVDControlNetPipeline(val_params, bundle)
        vdir = os.path.join(args.output_dir, f"validation-{current_step}")
        for i in range(min(args.num_validation_samples, len(val_dataset))):
            s = val_dataset[i]
            image = (s["pixel_values"][:1] + 1.0) / 2.0
            control = (s["trajectories"][None] + 1.0) / 2.0
            out = pipe(
                image, control, height=args.height, width=args.width,
                num_frames=args.num_frames, num_inference_steps=args.num_inference_steps,
                camera_cond=(s["cam_parameter"][None] if "cam_parameter" in s else None),
                bbox_condition=((s["bbox_trajectories"][None] + 1.0) / 2.0
                                if "bbox_trajectories" in s else None),
                seed=args.seed,
            )[0]
            export.save_side_by_side_gif(
                [(s["pixel_values"] + 1) / 2, (s["trajectories"] + 1) / 2, out],
                os.path.join(vdir, f"sample{i}.gif"),
            )
        print(f"validation GIFs -> {vdir}")

    def save_and_export(current_step: int):
        """Orbax state + diffusers-layout ControlNet AND its EMA twin — the
        reference's save hook writes both controlnet/ and controlnet_ema/
        (train...blender_14.py:940-947)."""
        ckpt.save_checkpoint(args.output_dir, current_step, trainer.state, args.checkpoints_total_limit)
        cdir = os.path.join(args.output_dir, f"checkpoint-{current_step}")
        ckpt.export_diffusers(
            trainer.state.controlnet_params, "controlnet", os.path.join(cdir, "controlnet")
        )
        if trainer.state.ema_params is not None:
            ckpt.export_diffusers(
                trainer.state.ema_params, "controlnet", os.path.join(cdir, "controlnet_ema")
            )

    # Resume fast-forward: continue the data order of an uninterrupted run by
    # skipping already-consumed batches of the restored epoch
    # (train...blender_14.py:1174-1197, 1209-1212). One batch == one trainer
    # micro-step, so the restored step count maps directly onto batches.
    bpe = epoch_batches(len(dataset), global_batch)
    start_epoch, skip = divmod(step, bpe)
    for epoch in range(start_epoch, args.num_train_epochs):
        for batch in loader.epoch(seed=args.seed + epoch,
                                  skip_batches=skip if epoch == start_epoch else 0):
            metrics = trainer.step(batch)
            step = int(trainer.state.step)
            logger.log(step, {k: v for k, v in metrics.items()})
            if step % 50 == 0:
                print(f"step {step} loss {float(metrics['loss']):.4f}")
            if step and step % args.checkpointing_steps == 0:
                save_and_export(step)
            if args.validation_steps and step and step % args.validation_steps == 0:
                run_validation(step)
            if args.max_train_steps and step >= args.max_train_steps:
                break
        if args.max_train_steps and step >= args.max_train_steps:
            break
    loader.close()

    ckpt.save_checkpoint(args.output_dir, step, trainer.state, args.checkpoints_total_limit)
    print(f"done at step {step}")


if __name__ == "__main__":
    main()
