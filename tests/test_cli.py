"""End-to-end smoke of the training CLI on a synthetic Blender fixture."""

import os

import numpy as np
import pytest


def _make_fixture(root, n_videos=2, n_frames=6):
    from PIL import Image

    for v in range(n_videos):
        name = f"obj_{v}_line"
        for sub in ("images", "traj_vid_enhanced"):
            d = os.path.join(root, name, sub)
            os.makedirs(d, exist_ok=True)
            for i in range(n_frames + 1):
                arr = (np.random.RandomState(v * 100 + i).rand(64, 64, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))


def test_train_cli_pretrain_smoke(tmp_path):
    from posetraj_tpu.train.cli import main

    data = tmp_path / "data"
    out = tmp_path / "out"
    _make_fixture(str(data))
    main([
        "--stage", "pretrain",
        "--video_folder", str(data),
        "--output_dir", str(out),
        "--tiny",
        "--height", "64", "--width", "64",
        "--num_frames", "2",
        "--per_device_batch_size", "1",
        "--gradient_accumulation_steps", "1",
        "--num_train_epochs", "2",
        "--max_train_steps", "2",
        "--checkpointing_steps", "2",
        "--validation_steps", "0",
        "--no_gradient_checkpointing",
        "--n_model_shards", "2",
    ])
    assert (out / "rec_para.txt").exists()
    assert (out / "posetraj.metrics.jsonl").exists()
    ckpts = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(out)
    assert any(
        f.startswith("controlnet") for f in os.listdir(out / sorted(ckpts)[-1])
    )
