"""End-to-end smoke of the batch inference driver (the reference repro-script
equivalent) on a synthetic VIPSeg fixture with the tiny bundle."""

import json
import os

import numpy as np


def _make_vipseg_fixture(root, n_frames=4):
    from PIL import Image

    name = "vid_x"
    os.makedirs(os.path.join(root, "imgs", name), exist_ok=True)
    os.makedirs(os.path.join(root, "trajectory_CoTracker_all"), exist_ok=True)
    for i in range(n_frames):
        arr = (np.random.RandomState(i).rand(48, 80, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "imgs", name, f"{i:04d}.jpg"))
    traj = {"0": [[8 + 4 * i, 10 + 2 * i] for i in range(n_frames)]}
    with open(os.path.join(root, "trajectory_CoTracker_all", f"{name}.json"), "w") as f:
        json.dump(traj, f)
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write(name + "\n")


def test_inference_driver_vipseg(tmp_path):
    from posetraj_tpu.inference import main

    data = tmp_path / "data"
    out = tmp_path / "results"
    _make_vipseg_fixture(str(data))
    main([
        "--mode", "vipseg",
        "--data_root", str(data),
        "--out_dir", str(out),
        "--tiny",
        "--height", "64", "--width", "64",
        "--num_frames", "2",
        "--steps", "2",
        "--limit", "1",
    ])
    vid_dir = out / "vid_x"
    pred = sorted(os.listdir(vid_dir / "pred"))
    assert len(pred) == 2
    assert (vid_dir / "side_by_side.gif").exists()
    assert (vid_dir / "gt").exists()
