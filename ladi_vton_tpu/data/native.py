"""ctypes binding for the native preprocessing core.

Loads ``native/libladi_preprocess.so`` (built by ``make -C native``) and
exposes numpy-in/numpy-out wrappers for the data layer's CPU-hot inner
loops: keypoint heatmaps, capsule polylines, box dilation, u8 resize.
Falls back transparently to the numpy oracles in ``data.raster`` /
``ops.morphology`` when the library isn't built — call
``native_available()`` to check, ``build()`` to compile in place.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libladi_preprocess.so"
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the native library in place. Returns success."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed: {e}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and os.environ.get("LADI_VTON_BUILD_NATIVE",
                                                 "1") == "1":
        build()
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.keypoint_heatmaps.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_float, f32p]
    lib.draw_polyline.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_float, f32p]
    lib.box_dilate.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, f32p]
    lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, u8p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def pose_heatmaps(keypoints: np.ndarray, shape: tuple[int, int],
                  sigma: float = 9.0) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ladi_vton_tpu.data.raster import pose_heatmaps as np_impl

        return np_impl(keypoints, shape, sigma)
    h, w = shape
    kp = np.ascontiguousarray(keypoints[:, :2], np.float32)
    out = np.empty((kp.shape[0], h, w), np.float32)
    lib.keypoint_heatmaps(kp, kp.shape[0], h, w, float(sigma), out)
    return out


def draw_polyline(h: int, w: int, points: np.ndarray, width: float,
                  out: Optional[np.ndarray] = None) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ladi_vton_tpu.data.raster import draw_polyline as np_impl

        return np_impl(h, w, points, width, out)
    if out is None:
        out = np.zeros((h, w), np.float32)
    pts = np.ascontiguousarray(points[:, :2], np.float32)
    lib.draw_polyline(pts, pts.shape[0], h, w, float(width), out)
    return out


def box_dilate(mask: np.ndarray, kernel: int = 5,
               iterations: int = 5) -> np.ndarray:
    lib = _load()
    if lib is None:
        import cv2

        return cv2.dilate(mask.astype(np.float32),
                          np.ones((kernel, kernel), np.uint16),
                          iterations=iterations)
    out = np.empty_like(mask, dtype=np.float32)
    lib.box_dilate(np.ascontiguousarray(mask, np.float32),
                   mask.shape[0], mask.shape[1], kernel, iterations, out)
    return out


def resize_bilinear_u8(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    lib = _load()
    h, w = out_hw
    if lib is None:
        import cv2

        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    c = img.shape[2] if img.ndim == 3 else 1
    src = np.ascontiguousarray(img.reshape(img.shape[0], img.shape[1], c))
    out = np.empty((h, w, c), np.uint8)
    lib.resize_bilinear_u8(src, img.shape[0], img.shape[1], c, h, w, out)
    return out if img.ndim == 3 else out[..., 0]
