"""Pallas fused filtered_lrelu: exactness vs the composed op (interpret mode
on the CPU suite; the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.ops.filtered_lrelu import filtered_lrelu
from long_video_gan_tpu.ops.filters import design_kaiser_lowpass


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.mark.parametrize("up,down,h,w,pad", [
    (2, 2, 33, 47, (9, 8, 9, 8)),
    (2, 1, 20, 30, 6),
    (1, 2, 40, 56, 8),
    (2, 2, 16, 24, 10),
])
def test_pallas_matches_composed(up, down, h, w, pad, rng):
    fu = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((2, 5, h, w)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    want = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad, clamp=256.0)
    got = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad, clamp=256.0,
                         impl="pallas")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,h,w,pad", [
    (2, 2, 17, 23, (9, 8, 9, 8)),
    (2, 1, 12, 18, 6),
    (1, 2, 20, 28, 8),
    (1, 1, 9, 11, 0),
])
def test_pallas_v2_matches_composed(up, down, h, w, pad, rng):
    from long_video_gan_tpu.ops.pallas.filtered_lrelu_v2 import filtered_lrelu_pallas_v2

    taps = None if (up == 1 and down == 1) else design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((2, 3, h, w)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    want = filtered_lrelu(x, taps, taps, b, up=up, down=down, padding=pad, clamp=256.0)
    got = filtered_lrelu_pallas_v2(x, taps, taps, b, up=up, down=down, padding=pad,
                                   clamp=256.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
