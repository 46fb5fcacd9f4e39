"""ctypes bindings for the native host-path rasterizer.

Builds lazily on first use (g++, no external deps); falls back cleanly if no
compiler is available — callers use `is_available()` and keep the cv2/XLA
paths as alternatives.

    from posetraj_tpu.native import rasterize_trajectory_video_native
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librasterize.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    # Always invoke make: it is a no-op when the .so is fresh and rebuilds it
    # when rasterize.cpp changed (a stale .so would present an old C ABI).
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
        )
    except Exception:
        if not os.path.exists(_LIB_PATH):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.rasterize_trajectory_video.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rasterize_bbox_video.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def rasterize_trajectory_video_native(
    trajectories: np.ndarray,
    num_frames: int,
    size: Tuple[int, int],
    line_width: float = 3.0,
    circle_radius: float = 3.0,
    fidelity_bgr_swap: bool = False,
) -> np.ndarray:
    """(K, >=num_frames, 2) float trajectories -> (num_frames, H, W, 3) uint8.
    RGB output (red lines, green endpoints), final frame black.
    fidelity_bgr_swap reproduces quirk Q5's per-trajectory color alternation
    (reference dataset.py:754-766) via color algebra in the kernel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable (no compiler?)")
    h, w = size
    traj = np.ascontiguousarray(trajectories[:, :num_frames], np.float32)
    out = np.empty((num_frames, h, w, 3), np.uint8)
    lib.rasterize_trajectory_video(
        traj.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        traj.shape[0], num_frames, h, w,
        ctypes.c_float(line_width), ctypes.c_float(circle_radius),
        ctypes.c_int(1 if fidelity_bgr_swap else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def rasterize_bbox_video_native(
    corners: np.ndarray,
    num_frames: int,
    size: Tuple[int, int],
    line_width: float = 2.0,
) -> np.ndarray:
    """(num_frames, 8, 2) projected bbox corners -> (num_frames, H, W, 3)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable (no compiler?)")
    h, w = size
    pts = np.ascontiguousarray(corners[:num_frames], np.float32)
    out = np.empty((num_frames, h, w, 3), np.uint8)
    lib.rasterize_bbox_video(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_frames, h, w, ctypes.c_float(line_width),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
