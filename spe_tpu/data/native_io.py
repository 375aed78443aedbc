"""ctypes bridge to the native batch JPEG decoder (spe_tpu/native/dataio.cc).

`decode_batch(paths, size, flips)` decodes + resizes + normalizes a whole
batch in C++ threads, writing straight into one (B, S, S, 3) float32 array.
Falls back to None when the native lib is unavailable (callers then use the
PIL path in spe_tpu/data/transforms.py).
"""

from __future__ import annotations

import ctypes
import pathlib
from typing import Optional, Sequence

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = pathlib.Path(__file__).resolve().parent.parent / "native" / "libdataio.so"
    if not so.exists():
        try:
            from spe_tpu.native.build import build

            build(verbose=False)
        except Exception:
            pass
    if not so.exists():
        _lib = False
        return False
    lib = ctypes.CDLL(str(so))
    lib.decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.decode_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


def decode_batch(paths: Sequence, size: int,
                 flips: Optional[Sequence[bool]] = None,
                 n_threads: int = 4) -> Optional[np.ndarray]:
    """Returns (B, size, size, 3) float32 normalized images, or None if the
    native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    blobs = [pathlib.Path(p).read_bytes() for p in paths]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    offsets[1:] = np.cumsum([len(b) for b in blobs])
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, np.uint8)
    out = np.empty((len(blobs), size, size, 3), np.float32)
    fl = np.array([1 if (flips is not None and flips[i]) else 0
                   for i in range(len(blobs))], np.uint8)
    ok = lib.decode_batch(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(blobs), size,
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads)
    if ok != len(blobs):
        return None
    return out
