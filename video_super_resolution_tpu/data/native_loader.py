"""ctypes bindings for the native C++ data path (native/vsr_dataio.cc).

The hot host-side input pipeline in C++: libpng decode, MATLAB-bicubic
degradation, crop/flip/window assembly, and a pthread prefetch pool feeding
bounded batches. Python keeps orchestration; NumPy buffers are passed
straight through ctypes (no pybind11 in this image — SURVEY.md env notes).

Falls back cleanly: ``available()`` is False when the .so hasn't been built
(``make -C native``), and ClipDataset remains the pure-Python reference
implementation the native loader is tested against.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libvsr_dataio.so",
)
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vsr_decode_png.restype = ctypes.POINTER(ctypes.c_float)
    lib.vsr_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vsr_free.argtypes = [ctypes.c_void_p]
    lib.vsr_resize_bicubic_aa.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.vsr_loader_create.restype = ctypes.c_void_p
    lib.vsr_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
    ]
    lib.vsr_loader_next.restype = ctypes.c_int
    lib.vsr_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vsr_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    if not os.path.exists(_LIB_PATH):
        return False
    try:
        _load()
        return True
    except OSError:
        return False


def decode_png(path: str) -> np.ndarray:
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    ptr = lib.vsr_decode_png(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if not ptr:
        raise IOError(f"native PNG decode failed: {path}")
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.vsr_free(ptr)
    return arr


def resize_bicubic_aa(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """MATLAB-preset antialias bicubic downscale of (H, W, 3) float32."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w, _ = img.shape
    out = np.empty((oh, ow, 3), np.float32)
    lib.vsr_resize_bicubic_aa(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
    )
    return out


class NativeClipLoader:
    """Threaded sliding-window training loader over PNG clip dirs."""

    def __init__(self, clips: Dict[str, List[str]], window: int = 3,
                 scale: int = 4, crop_size: int = 64, batch_size: int = 4,
                 augment: bool = True, num_workers: int = 4, seed: int = 0):
        lib = _load()
        paths: List[bytes] = []
        sizes: List[int] = []
        for name in sorted(clips):
            frames = clips[name]
            sizes.append(len(frames))
            paths.extend(p.encode() for p in frames)
        arr = (ctypes.c_char_p * len(paths))(*paths)
        szs = (ctypes.c_int * len(sizes))(*sizes)
        self._lib = lib
        self._handle = lib.vsr_loader_create(
            arr, szs, len(sizes), window, scale, crop_size, batch_size,
            int(augment), num_workers, seed,
        )
        self.window = window
        self.scale = scale
        self.crop = crop_size
        self.batch = batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        c, s, t, b = self.crop, self.scale, self.window, self.batch
        lr = np.empty((b, t, c, c, 3), np.float32)
        hr = np.empty((b, c * s, c * s, 3), np.float32)
        n = self._lib.vsr_loader_next(
            self._handle,
            lr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            hr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if n == 0:
            raise StopIteration
        return {"lr": lr, "hr": hr}

    def close(self):
        if self._handle:
            self._lib.vsr_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
