"""Data layer tests: rasterizer parity/quirks, dataset loaders on synthetic
fixtures, exporters."""

import json
import os

import numpy as np
import pytest

from posetraj_tpu.data import TrajectoryBlenderDataset, TrajectoryVIPSegDataset, export
from posetraj_tpu.data.datasets import batch_iterator
from posetraj_tpu.data.trajectories import trajectories_to_array, scale_to_target
from posetraj_tpu.ops.rasterize import rasterize_cv2, rasterize_video_xla


# ---------------------------------------------------------------------------
# Rasterizer
# ---------------------------------------------------------------------------


def test_rasterize_cv2_shapes_and_black_pad():
    traj = np.asarray([[[10, 10], [20, 20], [30, 30], [40, 40]]], np.float32)
    out = rasterize_cv2(traj, num_frames=4, size=(64, 64))
    assert out.shape == (4, 64, 64, 3)
    assert out[-1].sum() == 0  # final black frame (run_inference...repro.py:448-449)
    assert out[0].sum() > 0


def test_rasterize_cv2_bgr_swap_quirk():
    """Q5: with 2 trajectories, the first-drawn line ends blue, the last red
    (BGR->RGB conversion inside the per-trajectory loop, dataset.py:762)."""
    t1 = np.asarray([[[5, 5], [20, 5]]], np.float32)
    t2 = np.asarray([[[5, 40], [20, 40]]], np.float32)
    both = np.concatenate([t1, t2])
    img = rasterize_cv2(both, num_frames=2, size=(64, 64), fidelity_bgr_swap=True)[0]
    # trajectory 0 swapped twice -> stays at cv2's BGR red = channel 2 in RGB
    # order... concretely: row 5 (traj 0) ends with color (0,0,255) -> blue in
    # RGB; row 40 (traj 1) swapped once -> (255,0,0) red.
    assert img[5, 10, 2] == 255 and img[5, 10, 0] == 0  # blue line
    assert img[40, 10, 0] == 255 and img[40, 10, 2] == 0  # red line
    clean = rasterize_cv2(both, num_frames=2, size=(64, 64), fidelity_bgr_swap=False)[0]
    assert clean[5, 10, 0] == 255 and clean[40, 10, 0] == 255  # both red


def test_rasterize_xla_matches_cv2_roughly():
    """XLA hard mode vs cv2: same support (lines/circles in the same places)."""
    traj = np.asarray([[[10.0, 12.0], [40.0, 44.0], [50.0, 20.0]]], np.float32)
    ref = rasterize_cv2(traj, num_frames=3, size=(64, 64), fidelity_bgr_swap=False)
    got = np.asarray(
        rasterize_video_xla(traj, np.ones((1,), bool), 3, 64, 64, mode="hard")
    )
    assert got.shape == (3, 64, 64, 3)
    assert got[-1].sum() == 0
    for f in range(2):
        ref_mask = ref[f].sum(-1) > 0
        got_mask = got[f].sum(-1) > 0
        inter = (ref_mask & got_mask).sum()
        union = (ref_mask | got_mask).sum()
        assert inter / union > 0.6, f"frame {f}: IoU {inter/union:.2f}"


def test_rasterize_xla_gaussian_heatmap():
    traj = np.asarray([[[32.0, 32.0], [32.0, 32.0]]], np.float32)
    out = np.asarray(
        rasterize_video_xla(traj, np.ones((1,), bool), 2, 64, 64, mode="gaussian", sigma=3.0)
    )
    g = out[0, :, :, 1]
    assert g[32, 32] == pytest.approx(1.0, abs=1e-5)  # peak at the endpoint
    assert g[32, 42] < 0.01  # decays


def test_trajectory_array_and_scaling():
    tj = {"0": [[10, 20], [30, 40]], "1": [[1, 2], [3, 4]]}
    arr = trajectories_to_array(tj)
    assert arr.shape == (2, 2, 2)
    scaled = scale_to_target(arr, (100, 200), (50, 100))
    np.testing.assert_allclose(scaled[0, 0], [5, 10])


# ---------------------------------------------------------------------------
# Datasets on synthetic fixtures
# ---------------------------------------------------------------------------


def _make_blender_fixture(root, n_videos=2, n_frames=6):
    from PIL import Image

    for v in range(n_videos):
        name = f"obj_{v}_circle"
        for sub in ("images", "traj_vid_enhanced"):
            d = os.path.join(root, name, sub)
            os.makedirs(d, exist_ok=True)
            for i in range(n_frames + 1):
                arr = (np.random.RandomState(v * 100 + i).rand(48, 80, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.png"))
    return root


def test_blender_dataset(tmp_path):
    root = _make_blender_fixture(str(tmp_path))
    ds = TrajectoryBlenderDataset(root, sample_size=(32, 64), frame_length=4, seed=0, return_rot=True)
    assert len(ds) == 4  # 2 videos x repeat 2
    s = ds[0]
    assert s["pixel_values"].shape == (4, 32, 64, 3)
    assert s["trajectories"].shape == (4, 32, 64, 3)
    assert s["trajectories"][-1].min() == -1.0 and s["trajectories"][-1].max() == -1.0  # black pad
    assert -1.0 <= s["pixel_values"].min() and s["pixel_values"].max() <= 1.0
    assert s["rot_id"] == 1  # "circle" suffix


def test_blender_dataset_mask_initial(tmp_path):
    root = _make_blender_fixture(str(tmp_path))
    for v in range(2):
        np.save(os.path.join(root, f"obj_{v}_circle", "bbox_2d.npy"),
                np.asarray([[8, 12], [40, 60]]))
        os.rename(os.path.join(root, f"obj_{v}_circle", "bbox_2d.npy"),
                  os.path.join(root, f"obj_{v}_circle", "bbox_2d.py"))
    ds = TrajectoryBlenderDataset(root, sample_size=(32, 64), frame_length=4, seed=0,
                                  mask_initial=True)
    s = ds[0]
    m = s["initial_mask"]
    assert m.shape == (32, 64, 3)
    # Outside the bbox everything is masked to 0 -> normalized to -1; inside
    # the (resized) bbox the trajectory pixels survive.
    assert m.max() > -1.0
    assert np.allclose(m[0, :, :], -1.0) and np.allclose(m[-1, :, :], -1.0)


def _make_vipseg_fixture(root, n_frames=6):
    from PIL import Image

    name = "vid_a"
    os.makedirs(os.path.join(root, "imgs", name), exist_ok=True)
    os.makedirs(os.path.join(root, "trajectory_CoTracker_all"), exist_ok=True)
    for i in range(n_frames):
        arr = (np.random.RandomState(i).rand(60, 100, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "imgs", name, f"{i:04d}.jpg"))
    traj = {"0": [[10 + 5 * i, 20 + 3 * i] for i in range(n_frames)]}
    with open(os.path.join(root, "trajectory_CoTracker_all", f"{name}.json"), "w") as f:
        json.dump(traj, f)
    split = os.path.join(root, "train.txt")
    with open(split, "w") as f:
        f.write(name + "\n")
    return root, split


def test_vipseg_dataset(tmp_path):
    root, split = _make_vipseg_fixture(str(tmp_path))
    ds = TrajectoryVIPSegDataset(root, split, sample_size=(32, 64), frame_length=4, seed=0,
                                 return_cam=True, cam_mask_ratio=0.0)
    assert len(ds) == 4
    s = ds[0]
    assert s["pixel_values"].shape == (4, 32, 64, 3)
    assert s["trajectories"].shape == (4, 32, 64, 3)
    assert s["cam_parameter"].shape == (4, 12)
    np.testing.assert_allclose(s["cam_parameter"], 0.0)  # no camera.npy -> zeros


def test_batch_iterator(tmp_path):
    root = _make_blender_fixture(str(tmp_path))
    ds = TrajectoryBlenderDataset(root, sample_size=(32, 64), frame_length=4, seed=0)
    batches = list(batch_iterator(ds, batch_size=2, seed=0))
    assert len(batches) == 2
    assert batches[0]["pixel_values"].shape == (2, 4, 32, 64, 3)
    assert "img_key" not in batches[0]


# ---------------------------------------------------------------------------
# Export
# ---------------------------------------------------------------------------


def test_exporters(tmp_path):
    frames = np.random.RandomState(0).rand(3, 16, 16, 3).astype(np.float32)
    paths = export.export_to_images(frames, str(tmp_path / "imgs"))
    assert len(paths) == 3 and os.path.exists(paths[0])
    gif = export.export_to_gif(frames, str(tmp_path / "a.gif"))
    assert os.path.getsize(gif) > 0
    sbs = export.save_side_by_side_gif([frames, frames], str(tmp_path / "b.gif"))
    assert os.path.getsize(sbs) > 0
    grid = export.save_videos_grid(np.stack([frames, frames, frames]), str(tmp_path / "c.gif"))
    assert os.path.getsize(grid) > 0


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def test_metrics():
    from posetraj_tpu.data import metrics

    a = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    assert metrics.psnr(a, a) == float("inf")
    assert metrics.ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(a + 0.1 * np.random.RandomState(1).randn(*a.shape), 0, 1)
    r = metrics.video_psnr_ssim(noisy, a)
    assert 10 < r["psnr"] < 40 and 0 < r["ssim"] <= 1
    t = np.zeros((2, 3, 2))
    g = np.ones((2, 3, 2))
    assert metrics.objmc(t, g) == pytest.approx(np.sqrt(2.0))


def test_resilient_dataset():
    from posetraj_tpu.data.datasets import ResilientDataset

    class Flaky:
        def __len__(self): return 4
        def __getitem__(self, i):
            if i == 0:
                raise IOError("corrupt sample")
            return {"x": i}

    ds = ResilientDataset(Flaky(), seed=0)
    out = ds[0]  # resamples instead of raising (dataset.py:83-94 behavior)
    assert out["x"] != 0


def test_batch_iterator_remainder_padding_and_skip():
    """Remainder batches are wrap-padded (reference DataLoader keeps the last
    partial batch; we pad for static shapes) and skip_batches fast-forwards
    without changing the epoch order."""
    from posetraj_tpu.data.datasets import epoch_batches

    class Ix:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.float32)}

    ds = Ix()
    batches = list(batch_iterator(ds, batch_size=2, shuffle=False, seed=0))
    assert len(batches) == epoch_batches(5, 2) == 3
    assert [b["x"][:, 0].tolist() for b in batches] == [[0, 1], [2, 3], [4, 0]]
    skipped = list(batch_iterator(ds, batch_size=2, shuffle=False, seed=0, skip_batches=2))
    assert [b["x"][:, 0].tolist() for b in skipped] == [[4, 0]]
    # shuffled epochs are reproducible across the two entry points
    a = list(batch_iterator(ds, batch_size=2, seed=7))
    b = list(batch_iterator(ds, batch_size=2, seed=7))
    assert all(np.array_equal(x["x"], y["x"]) for x, y in zip(a, b))


def test_prefetch_loader_matches_batch_iterator():
    from posetraj_tpu.data.datasets import PrefetchLoader

    class Ix:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    ds = Ix()
    loader = PrefetchLoader(ds, batch_size=3, num_workers=4)
    got = list(loader.epoch(seed=3))
    want = list(batch_iterator(ds, batch_size=3, seed=3))
    assert len(got) == len(want) == len(loader)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["x"], w["x"])
    # resume fast-forward parity too
    got2 = list(loader.epoch(seed=3, skip_batches=2))
    np.testing.assert_array_equal(got2[0]["x"], want[2]["x"])
    loader.close()


def test_prefetch_loader_overlaps_loading():
    """Loader IO hides behind a fake device step (VERDICT next-#9): consuming
    an epoch with a slow __getitem__ plus a fake step takes ~max(io, step) per
    batch, not their sum."""
    import time

    from posetraj_tpu.data.datasets import PrefetchLoader

    class Slow:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            time.sleep(0.05)  # releases the GIL like PIL/cv2 do
            return {"x": np.asarray([i], np.float32)}

    loader = PrefetchLoader(Slow(), batch_size=2, num_workers=4, prefetch_batches=2)
    it = loader.epoch(seed=0)
    first = next(it)  # warm the pipeline
    t0 = time.monotonic()
    for batch in it:
        time.sleep(0.08)  # fake step
    elapsed = time.monotonic() - t0
    serial = 3 * (2 * 0.05 + 0.08)  # 3 remaining batches, serial IO + step
    assert elapsed < serial * 0.8, (elapsed, serial)
    loader.close()


def test_prefetch_loader_per_process_slices():
    """Multi-host feeding contract: per-process loaders carve the SAME global
    batch into contiguous slices (Trainer._globalize reassembles them)."""
    from posetraj_tpu.data.datasets import PrefetchLoader

    class Ix:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.float32)}

    full = list(PrefetchLoader(Ix(), batch_size=4).epoch(seed=5))
    p0 = list(PrefetchLoader(Ix(), batch_size=4, process_index=0, process_count=2).epoch(seed=5))
    p1 = list(PrefetchLoader(Ix(), batch_size=4, process_index=1, process_count=2).epoch(seed=5))
    for f, a, b in zip(full, p0, p1):
        np.testing.assert_array_equal(f["x"], np.concatenate([a["x"], b["x"]]))


def test_prefetch_loader_deterministic_with_random_consuming_dataset(tmp_path):
    """The docstring claim at PrefetchLoader: num_workers=8 must reproduce
    num_workers=0 (batch_iterator) byte-for-byte even when __getitem__
    consumes randomness (the random frame window). Pre-fix, worker threads
    raced on a shared random.Random and sample content depended on thread
    scheduling."""
    from posetraj_tpu.data.datasets import PrefetchLoader, batch_iterator

    root = _make_blender_fixture(str(tmp_path), n_videos=3, n_frames=12)
    ds = TrajectoryBlenderDataset(root, sample_size=(16, 32), frame_length=4, seed=5)

    ref_epochs = []
    for ep in range(2):
        ref_epochs.append(list(batch_iterator(ds, batch_size=2, seed=100 + ep)))

    loader = PrefetchLoader(ds, batch_size=2, num_workers=8, prefetch_batches=3)
    try:
        for ep in range(2):
            got = list(loader.epoch(seed=100 + ep))
            assert len(got) == len(ref_epochs[ep])
            for b_got, b_ref in zip(got, ref_epochs[ep]):
                for k in b_ref:
                    np.testing.assert_array_equal(b_got[k], b_ref[k])
    finally:
        loader.close()
    # Different epoch seeds must actually draw different windows (the frame
    # window is the only randomness; with 9 possible starts per sample and 6
    # samples, identical epochs would mean the rng is being ignored).
    flat1 = np.concatenate([b["pixel_values"].ravel() for b in ref_epochs[0]])
    flat2 = np.concatenate([b["pixel_values"].ravel() for b in ref_epochs[1]])
    assert not np.array_equal(flat1, flat2)


def test_vipseg_cam_mask_deterministic(tmp_path):
    """The cam_mask_ratio coin-flip is per-(seed, epoch, index): repeated
    loads of the same index agree, and the mask pattern across indices is
    reproducible after set_epoch."""
    root, split = _make_vipseg_fixture(str(tmp_path))
    ds = TrajectoryVIPSegDataset(
        root, split, sample_size=(16, 32), frame_length=4, return_cam=True,
        cam_mask_ratio=0.5, seed=3,
    )
    ds.set_epoch(7)
    first = [ds[i]["cam_parameter"] for i in range(len(ds))]
    second = [ds[i]["cam_parameter"] for i in range(len(ds))]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_ssim_windowed_matches_direct_implementation():
    """Cross-check metrics.ssim (separable scipy correlate1d formulation)
    against a literal O(N*win^2) translation of Wang et al. 2004: explicit
    11x11 Gaussian-weighted window statistics at every fully-interior pixel."""
    from posetraj_tpu.data import metrics

    rng = np.random.RandomState(3)
    a = rng.rand(24, 20).astype(np.float64)
    b = np.clip(a + 0.15 * rng.randn(24, 20), 0, 1)

    win, sigma = 11, 1.5
    r = np.arange(win) - (win - 1) / 2.0
    k1d = np.exp(-(r**2) / (2 * sigma**2))
    w = np.outer(k1d, k1d)
    w /= w.sum()
    c1, c2 = 0.01**2, 0.03**2
    pad = win // 2
    vals = []
    for i in range(pad, a.shape[0] - pad):
        for j in range(pad, a.shape[1] - pad):
            pa = a[i - pad : i + pad + 1, j - pad : j + pad + 1]
            pb = b[i - pad : i + pad + 1, j - pad : j + pad + 1]
            mu_a = (w * pa).sum()
            mu_b = (w * pb).sum()
            va = (w * pa * pa).sum() - mu_a**2
            vb = (w * pb * pb).sum() - mu_b**2
            cov = (w * pa * pb).sum() - mu_a * mu_b
            vals.append(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2)))
    direct = float(np.mean(vals))
    assert metrics.ssim(a, b) == pytest.approx(direct, abs=1e-12)

    # Properties: identity is exactly 1; more noise monotonically hurts;
    # channel planes average (multichannel == mean of per-plane scores).
    assert metrics.ssim(a, a) == pytest.approx(1.0, abs=1e-12)
    worse = np.clip(a + 0.4 * rng.randn(*a.shape), 0, 1)
    assert metrics.ssim(a, worse) < metrics.ssim(a, b) < 1.0
    rgb_a = np.stack([a, a * 0.5, 1 - a], axis=-1)
    rgb_b = np.stack([b, np.clip(b * 0.5, 0, 1), 1 - b], axis=-1)
    per_plane = np.mean([metrics.ssim(rgb_a[..., c], rgb_b[..., c]) for c in range(3)])
    assert metrics.ssim(rgb_a, rgb_b) == pytest.approx(per_plane, abs=1e-12)
