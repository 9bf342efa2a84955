"""Batched JPEG decoding: native C++ threadpool decoder with PIL fallback.

The reference hides JPEG decode cost behind torch DataLoader worker processes
(train_lres.py:281-287); a 128-frame clip costs 128 decodes per sample, which
is the host-side bottleneck for stage-1 training. The native decoder
(native/jpeg_decoder.cpp, built by native/build.py) decodes a batch across a
libjpeg(-turbo) threadpool in one call; this module transparently falls back
to PIL when the extension is not built.
"""

from __future__ import annotations

import numpy as np

_native = None
_native_checked = False


def _load_native():
    global _native, _native_checked
    if _native_checked:
        return _native
    _native_checked = True
    try:
        from . import jpeg_native

        _native = jpeg_native
        return _native
    except Exception:
        pass
    # Not built yet: build on first use, like the reference builds its CUDA
    # extensions on demand (/root/reference/torch_utils/custom_ops.py:59-157).
    # The build is atomic (compile to temp + rename), so a concurrent build in
    # another process at worst duplicates a few seconds of g++ work.
    try:
        from ..native.build import build

        build(verbose=False)
        from . import jpeg_native

        _native = jpeg_native
    except Exception as e:
        import warnings

        warnings.warn(
            f"native JPEG decoder unavailable ({type(e).__name__}: {e}); "
            "falling back to PIL (~3.5x slower batch decode). Build manually "
            "with `python -m long_video_gan_tpu.native.build`.")
        _native = None
    return _native


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode one JPEG to [H, W, 3] uint8 RGB."""
    return decode_jpeg_batch([blob])[0]


def decode_jpeg_batch(blobs: list[bytes]) -> np.ndarray:
    """Decode same-sized JPEGs to [N, H, W, 3] uint8 RGB."""
    native = _load_native()
    if native is not None:
        return native.decode_batch(blobs)
    return _decode_batch_pil(blobs)


def _decode_batch_pil(blobs: list[bytes]) -> np.ndarray:
    import io

    from PIL import Image

    frames = []
    for blob in blobs:
        img = Image.open(io.BytesIO(blob))
        arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
        frames.append(arr)
    return np.stack(frames)


def encode_jpeg(array: np.ndarray, quality: int = 95, subsampling: str = "4:2:0") -> bytes:
    """Encode [H, W, 3] uint8 RGB to JPEG bytes (dataset tools)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    ss = {"4:4:4": 0, "4:2:2": 1, "4:2:0": 2}[subsampling]
    Image.fromarray(array).save(buf, format="jpeg", quality=quality, subsampling=ss)
    return buf.getvalue()
