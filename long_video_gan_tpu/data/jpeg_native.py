"""ctypes binding for the native batched JPEG decoder
(native/jpeg_decoder.cpp; build with `python -m long_video_gan_tpu.native.build`)."""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent.parent / "native" / "libjpeg_decoder.so"
if not _LIB_PATH.is_file():
    raise ImportError(f"native decoder not built: {_LIB_PATH}")

_lib = ctypes.CDLL(str(_LIB_PATH))
_lib.lvg_decoder_create.restype = ctypes.c_void_p
_lib.lvg_decoder_create.argtypes = [ctypes.c_int]
_lib.lvg_decoder_destroy.argtypes = [ctypes.c_void_p]
_lib.lvg_probe.restype = ctypes.c_int
_lib.lvg_probe.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                           ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                           ctypes.POINTER(ctypes.c_int)]
_lib.lvg_decode_batch.restype = ctypes.c_int
_lib.lvg_decode_batch.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
    ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
]

_pool = _lib.lvg_decoder_create(int(os.environ.get("LVG_DECODE_THREADS", "0")))


def probe(blob: bytes) -> tuple[int, int, int]:
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = _lib.lvg_probe(blob, len(blob), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise ValueError("invalid JPEG")
    return h.value, w.value, c.value


def decode_batch(blobs: list[bytes]) -> np.ndarray:
    """Decode same-sized RGB JPEGs to [N, H, W, 3] uint8 across the pool."""
    n = len(blobs)
    assert n > 0
    h, w, c = probe(blobs[0])
    out = np.empty((n, h, w, c), dtype=np.uint8)
    blob_ptrs = (ctypes.c_char_p * n)(*blobs)
    sizes = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    rc = _lib.lvg_decode_batch(_pool, blob_ptrs, sizes, n,
                               out.ctypes.data_as(ctypes.c_void_p), h, w, c)
    if rc != 0:
        raise ValueError(f"JPEG batch decode failed (code {rc})")
    return out
