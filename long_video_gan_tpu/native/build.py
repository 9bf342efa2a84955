"""Build the native extensions (g++ + libjpeg, no pybind11 dependency).

    python -m long_video_gan_tpu.native.build

Produces long_video_gan_tpu/native/libjpeg_decoder.so, loaded via ctypes by
data/jpeg_native.py. Safe to skip: the data pipeline falls back to PIL.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

NATIVE_DIR = Path(__file__).parent


def build(verbose: bool = True) -> Path:
    import os

    src = NATIVE_DIR / "jpeg_decoder.cpp"
    out = NATIVE_DIR / "libjpeg_decoder.so"
    # Compile to a temp name + rename: atomic against concurrent builders
    # (data loader workers in several processes may race on first use).
    tmp = NATIVE_DIR / f".libjpeg_decoder.{os.getpid()}.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(tmp), "-ljpeg", "-lpthread",
    ]
    if verbose:
        print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True,
                       capture_output=not verbose)
        os.replace(tmp, out)
    finally:
        tmp.unlink(missing_ok=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"Built {path}")
    # Round-trip self-test.
    sys.path.insert(0, str(NATIVE_DIR.parent.parent))
    import numpy as np

    from long_video_gan_tpu.data import jpeg_native
    from long_video_gan_tpu.data.jpeg import encode_jpeg

    rng = np.random.default_rng(0)
    frames = (rng.uniform(0, 255, size=(4, 24, 32, 3))).astype(np.uint8)
    blobs = [encode_jpeg(f, quality=100, subsampling="4:4:4") for f in frames]
    decoded = jpeg_native.decode_batch(blobs)
    err = np.abs(decoded.astype(int) - frames.astype(int)).mean()
    print(f"round-trip mean abs error: {err:.2f} (q100 jpeg, expected < 4)")
    assert decoded.shape == frames.shape and err < 4
    print("self-test OK")
