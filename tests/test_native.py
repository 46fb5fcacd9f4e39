"""Native C++ rasterizer tests: build via ctypes, compare against cv2."""

import numpy as np
import pytest

from posetraj_tpu import native
from posetraj_tpu.ops.rasterize import rasterize_cv2

pytestmark = pytest.mark.skipif(not native.is_available(), reason="no C++ toolchain")


def test_native_trajectory_video_matches_cv2_support():
    traj = np.asarray([[[10, 12], [40, 44], [50, 20], [30, 30]]], np.float32)
    got = native.rasterize_trajectory_video_native(traj, 4, (64, 64))
    ref = rasterize_cv2(traj, 4, (64, 64), fidelity_bgr_swap=False)
    assert got.shape == ref.shape == (4, 64, 64, 3)
    assert got[-1].sum() == 0
    for f in range(3):
        a = got[f].sum(-1) > 0
        b = ref[f].sum(-1) > 0
        iou = (a & b).sum() / max((a | b).sum(), 1)
        assert iou > 0.6, f"frame {f}: IoU {iou:.2f}"  # cv2 cap/rounding semantics differ slightly
    # color semantics: lines red, endpoints green
    assert got[0][..., 0].max() == 255
    assert got[0][..., 1].max() == 255


def test_native_multi_trajectory():
    traj = np.asarray(
        [[[5, 5], [20, 5], [35, 5]], [[5, 40], [20, 40], [35, 40]]], np.float32
    )
    got = native.rasterize_trajectory_video_native(traj, 3, (64, 64))
    assert (got[0][5, 5:20, 0] == 255).any()
    assert (got[0][40, 5:20, 0] == 255).any()


def test_native_bbox_video():
    corners = np.asarray(
        [[[10, 10], [30, 10], [30, 30], [10, 30], [15, 15], [35, 15], [35, 35], [15, 35]]] * 3,
        np.float32,
    )
    got = native.rasterize_bbox_video_native(corners, 3, (64, 64))
    assert got.shape == (3, 64, 64, 3)
    assert got[0].sum() > 0 and got[-1].sum() == 0
    # yellow wireframe: R and G set, B zero
    ys, xs = np.nonzero(got[0][..., 0])
    assert (got[0][ys, xs, 1] == 255).all() and (got[0][ys, xs, 2] == 0).all()
