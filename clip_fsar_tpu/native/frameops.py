"""ctypes binding for the native frame-preprocessing library.

Builds ``libframeops.so`` from frameops.cpp on first use (g++ is baked
into the image; the artifact is cached next to the source).  All entry
points degrade gracefully: ``available()`` is False when the toolchain or
artifact is missing and callers fall back to the cv2/numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from clip_fsar_tpu.utils.logging import get_logger

logger = get_logger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "frameops.cpp")
_LIB_PATH = os.path.join(_HERE, "libframeops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.info("native frameops build failed (%s); using cv2 fallback", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.info("native frameops load failed (%s)", e)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.clip_resize_crop_flip.argtypes = [u8p] + [ctypes.c_int] * 10 + [u8p]
        lib.clip_resize_crop_flip.restype = ctypes.c_int
        lib.clip_resize.argtypes = [u8p] + [ctypes.c_int] * 5 + [u8p]
        lib.clip_resize.restype = ctypes.c_int
        lib.frameops_num_threads.restype = ctypes.c_int
        _lib = lib
        logger.info("native frameops loaded (%d OpenMP threads)", lib.frameops_num_threads())
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_crop_flip(
    frames: np.ndarray,
    out_h: int,
    out_w: int,
    crop_y: int,
    crop_x: int,
    crop_h: int,
    crop_w: int,
    flip: bool = False,
) -> np.ndarray:
    """Fused bilinear-resize(+crop+flip) of a uint8 [T, H, W, 3] clip:
    resize the clip to (out_h, out_w), take the (crop_h, crop_w) window at
    (crop_y, crop_x), optionally mirror horizontally — one C++ pass, only
    cropped pixels computed."""
    lib = _load()
    assert lib is not None, "native frameops unavailable — guard with available()"
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    out = np.empty((t, crop_h, crop_w, 3), np.uint8)
    rc = lib.clip_resize_crop_flip(
        _u8p(frames), t, h, w, out_h, out_w, crop_y, crop_x, crop_h, crop_w, int(flip), _u8p(out)
    )
    if rc != 0:
        raise ValueError(f"invalid crop window ({crop_y},{crop_x},{crop_h},{crop_w}) for resize ({out_h},{out_w})")
    return out


def resize(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, _ = frames.shape
    out = np.empty((t, out_h, out_w, 3), np.uint8)
    lib.clip_resize(_u8p(frames), t, h, w, out_h, out_w, _u8p(out))
    return out
