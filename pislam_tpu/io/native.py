"""ctypes bindings for the native runtime (native/pislam_io.cpp).

Builds the shared library on first use (g++, libpng, zlib -- all baked into
the image); falls back to a pure-Python PIL path if the toolchain is missing
so the framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "pislam_io.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libpislam_io.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO,
           "-lpng", "-lz", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception:
            _lib_failed = True
            return None
        lib.pio_read_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
        lib.pio_read_png.restype = ctypes.c_int
        lib.pio_write_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32]
        lib.pio_write_png.restype = ctypes.c_int
        lib.pio_free.argtypes = [ctypes.c_void_p]
        lib.pio_stream_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32]
        lib.pio_stream_open.restype = ctypes.c_void_p
        lib.pio_stream_len.argtypes = [ctypes.c_void_p]
        lib.pio_stream_len.restype = ctypes.c_int
        lib.pio_stream_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.pio_stream_next.restype = ctypes.c_int
        lib.pio_stream_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def read_png(path: str) -> np.ndarray:
    """(H, W) uint8 grayscale."""
    lib = get_lib()
    if lib is None:
        from PIL import Image
        return np.asarray(Image.open(path).convert("L"))
    data = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    rc = lib.pio_read_png(path.encode(), ctypes.byref(data),
                          ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"pio_read_png({path}) failed: {rc}")
    try:
        arr = np.ctypeslib.as_array(data, shape=(h.value, w.value)).copy()
    finally:
        lib.pio_free(ctypes.cast(data, ctypes.c_void_p))
    return arr


def write_png(path: str, img: np.ndarray):
    img = np.ascontiguousarray(img, np.uint8)
    lib = get_lib()
    if lib is None:
        from PIL import Image
        Image.fromarray(img, "L").save(path)
        return
    h, w = img.shape
    rc = lib.pio_write_png(path.encode(),
                           img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           w, h, img.strides[0])
    if rc != 0:
        raise IOError(f"pio_write_png({path}) failed: {rc}")


class FrameStream:
    """Background-prefetched PNG frame stream (fixed size, ring buffer).

    Decode runs in a native thread so it overlaps device compute. Iterating
    yields (H, W) uint8 frames in path order; decode errors raise.
    """

    def __init__(self, paths, width: int, height: int, capacity: int = 8):
        self._paths = list(paths)
        self._w, self._h = width, height
        self._lib = get_lib()
        self._handle = None
        self._idx = 0
        if self._lib is not None:
            joined = "\n".join(self._paths).encode()
            self._handle = self._lib.pio_stream_open(
                joined, width, height, capacity)
            if not self._handle:
                raise IOError("pio_stream_open failed")

    def __len__(self):
        return len(self._paths)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is not None:
            out = np.empty((self._h, self._w), np.uint8)
            rc = self._lib.pio_stream_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if rc == 1:
                raise StopIteration
            if rc != 0:
                raise IOError(f"frame decode failed (rc={rc})")
            return out
        # Python fallback
        if self._idx >= len(self._paths):
            raise StopIteration
        img = read_png(self._paths[self._idx])
        self._idx += 1
        if img.shape != (self._h, self._w):
            raise IOError(f"frame size {img.shape} != {(self._h, self._w)}")
        return img

    def close(self):
        if self._handle is not None:
            self._lib.pio_stream_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
