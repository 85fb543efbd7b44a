"""ctypes bindings for the native projection core, with auto-build and a
graceful fallback to the numpy path when no toolchain is available.

Usage:
    from rangeldm_tpu.native import range_image_native, available
    img, mask, cw = range_image_native(pc, spec)   # == range_image_np(...)
"""

from __future__ import annotations

import ctypes
import threading
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libprojection.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False
_load_lock = threading.Lock()

_ROW_MODES = {"kitti": 0, "ring": 1, "uniform": 2}


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        # retry without OpenMP
        try:
            subprocess.run(
                ["make", "-C", _DIR,
                 "CXXFLAGS=-O3 -fPIC -shared -std=c++17"],
                check=True, capture_output=True, timeout=120)
            return os.path.exists(_LIB_PATH)
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _load_lock:
        if _lib is not None or _tried:   # lost the race: another thread won
            return _lib
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    """Build+load under _load_lock — concurrent loader threads must not run
    two `make` builds over the same .so and CDLL a half-written file.
    Cross-PROCESS races (several CLIs / multihost workers starting on one
    fresh checkout) are serialized with an fcntl file lock; the Makefile
    additionally compiles to a temp file and renames, so even a rebuild
    that races a dlopen in another process swaps the .so atomically."""
    global _lib, _tried
    _tried = True
    src = os.path.join(_DIR, "projection.cpp")

    def needs_build():
        return not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))

    if needs_build():
        try:
            import fcntl
            with open(os.path.join(_DIR, ".build.lock"), "w") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                try:
                    if needs_build() and not _build():  # loser re-checks
                        return None
                finally:
                    fcntl.flock(lockf, fcntl.LOCK_UN)
        except ImportError:                       # non-POSIX fallback
            if needs_build() and not _build():
                return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.kitti_row_inds.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, f32p, f32p, ctypes.c_int, i32p]
    lib.project_scan.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, f32p, f32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        f32p, u8p, u8p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def range_image_native(pc: np.ndarray, spec) -> Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]:
    """Full projection pipeline (project + fill + normalize) in C++.
    Matches geometry.range_image_np."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native projection library unavailable")
    pc = np.ascontiguousarray(pc, np.float32)
    n, stride = pc.shape
    if spec.row_mode == "ring" and stride < 5:
        # C++ reads pc[i*stride + 4] as the ring id; a 4-column cloud
        # would read past the buffer (the numpy path raises IndexError
        # for the same misuse)
        raise ValueError(
            f"ring-mode spec {spec.name!r} needs 5-column clouds "
            f"(x,y,z,intensity,ring); got stride {stride}")
    if stride < 4:
        # every mode reads pc[i*stride + 3] as intensity; an xyz-only
        # cloud would read the next point's x (and one float past the
        # allocation for the last point) instead of raising like numpy
        raise ValueError(
            f"projection needs >=4-column clouds (x,y,z,intensity); "
            f"got stride {stride}")
    h, w = spec.n_beams, spec.width
    image = np.empty((h, w, 2), np.float32)
    mask = np.empty((h, w), np.uint8)
    cw = np.empty((h, w), np.uint8)
    encoding = 1 if spec.log else (2 if spec.inverse else 0)
    lib.project_scan(
        pc, n, stride,
        np.ascontiguousarray(spec.height, np.float32),
        np.ascontiguousarray(spec.incl, np.float32),
        spec.n_beams, spec.width, _ROW_MODES[spec.row_mode], encoding,
        float(spec.fov_up), float(spec.fov_down), float(spec.min_depth),
        float(spec.range_fill), float(spec.mean), float(spec.std),
        float(spec.intensity_fill),
        image, mask, cw)
    return image, mask.astype(bool), cw.astype(bool)
