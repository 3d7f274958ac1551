"""ctypes binding for the native async frame sink (native/framesink.cpp).

Builds the shared library on first use (g++ is available in the image);
falls back to synchronous PIL writes if the toolchain is missing, so the
engine never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import time
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libframesink.so"))


def _build_lib() -> Optional[str]:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "framesink.cpp"))
    # rebuild when missing OR stale (framesink.cpp newer than the .so) so
    # source edits are never silently ignored
    fresh = os.path.exists(_LIB_PATH) and (
        not os.path.exists(src)
        or os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)
    )
    if fresh:
        return _LIB_PATH
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
        return _LIB_PATH if os.path.exists(_LIB_PATH) else None
    except Exception:
        return None


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        # ABI-incompatible binary on this host: engage the PIL fallback
        return None
    lib.fs_create.restype = ctypes.c_void_p
    lib.fs_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.fs_submit.restype = ctypes.c_int
    lib.fs_submit.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p]
    lib.fs_pending.restype = ctypes.c_long
    lib.fs_pending.argtypes = [ctypes.c_void_p]
    lib.fs_close.restype = None
    lib.fs_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class FrameSink:
    """Async PNG recorder: submit (H, W, 3) float [0,1] or uint8 frames;
    encoding/writing happens on native worker threads."""

    def __init__(self, directory: str, width: int, height: int,
                 workers: int = 2, queue_capacity: int = 8):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.width, self.height = width, height
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.fs_create(
                directory.encode(), width, height, workers, queue_capacity
            )

    @property
    def native(self) -> bool:
        return self._handle is not None

    def _to_u8(self, frame) -> np.ndarray:
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
        assert arr.shape == (self.height, self.width, 3), arr.shape
        return np.ascontiguousarray(arr)

    def submit(self, frame_index: int, frame) -> None:
        arr = self._to_u8(frame)
        if self._handle is not None:
            buf = arr.tobytes()
            while self._lib.fs_submit(self._handle, frame_index, buf) != 0:
                time.sleep(0.002)  # queue full: apply gentle backpressure
            return
        # fallback: synchronous PIL
        from PIL import Image

        Image.fromarray(arr).save(
            os.path.join(self.directory, f"frame_{frame_index:08d}.png")
        )

    def pending(self) -> int:
        if self._handle is not None:
            return int(self._lib.fs_pending(self._handle))
        return 0

    def close(self) -> None:
        if self._handle is not None:
            self._lib.fs_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
