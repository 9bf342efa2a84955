"""Native JPEG decoder: correctness vs PIL, gated on the built extension."""

import numpy as np
import pytest

from long_video_gan_tpu.data.jpeg import _decode_batch_pil, encode_jpeg

jpeg_native = pytest.importorskip("long_video_gan_tpu.data.jpeg_native")


def test_native_matches_pil(rng):
    frames = rng.integers(0, 255, size=(8, 24, 32, 3)).astype(np.uint8)
    blobs = [encode_jpeg(f, quality=100, subsampling="4:4:4") for f in frames]
    native = jpeg_native.decode_batch(blobs)
    pil = _decode_batch_pil(blobs)
    assert native.shape == pil.shape == frames.shape
    # Both decoders consume the same bitstream; IDCT rounding may differ by 1.
    assert np.abs(native.astype(int) - pil.astype(int)).max() <= 1


def test_probe(rng):
    frame = rng.integers(0, 255, size=(17, 23, 3)).astype(np.uint8)
    blob = encode_jpeg(frame)
    assert jpeg_native.probe(blob) == (17, 23, 3)
    with pytest.raises(ValueError):
        jpeg_native.probe(b"not a jpeg")
