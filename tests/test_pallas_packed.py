"""Lane-packed fused filtered_lrelu kernel (v4): forward + custom-VJP
exactness vs the composed op (interpret mode on the CPU suite; the same
kernel compiles for TPU via Mosaic). Also covers the pack/unpack lane
round-trip and the block-diagonal operator construction at several k."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.ops.filtered_lrelu import filtered_lrelu
from long_video_gan_tpu.ops.filters import design_kaiser_lowpass


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    import importlib

    flr_mod = importlib.import_module("long_video_gan_tpu.ops.filtered_lrelu")

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(flr_mod, "FORCE_FUSED_ON_CPU", True)


CASES = [
    (2, 2, 21, 31, (9, 8, 9, 8)),
    (2, 1, 14, 22, 6),
    (1, 2, 24, 32, 8),
    (2, 2, 12, 16, 10),
    # production up4 geometry (SG3 layers 3/5/7/10 run up=4, down=2 on
    # non-square maps; see BASELINE.md round-3 per-layer budget)
    (4, 2, 10, 16, (7, 6, 7, 6)),
]


def test_block_diag_structure():
    from long_video_gan_tpu.ops.pallas.filtered_lrelu_packed import _block_diag

    m = np.arange(6, dtype=np.float32).reshape(2, 3)
    bd = _block_diag(m, 3)
    assert bd.shape == (6, 9)
    for j in range(3):
        np.testing.assert_array_equal(bd[2 * j:2 * j + 2, 3 * j:3 * j + 3], m)
    assert np.count_nonzero(bd) == 3 * np.count_nonzero(m)


@pytest.mark.parametrize("k", [1, 2, 3])
@pytest.mark.parametrize("up,down,h,w,pad", CASES[:2])
def test_packed_forward_matches_composed(up, down, h, w, pad, k, rng,
                                         monkeypatch):
    monkeypatch.setenv("LVG_PACKED_K", str(k))
    from long_video_gan_tpu.ops.pallas import filtered_lrelu_packed as mod
    mod._packed_fwd_plan.cache_clear()
    mod._packed_bwd_plan.cache_clear()

    fu = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    # 2*3 = 6 images: k=1/2/3 all divide it; k=4 would exercise batch pad.
    x = jnp.asarray(rng.standard_normal((2, 3, h, w)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    want = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad, clamp=256.0)
    got = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad, clamp=256.0,
                         impl="packed")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,h,w,pad", CASES[2:4])
def test_packed_forward_auto_k(up, down, h, w, pad, rng):
    """Default (auto-picked) k, including a batch that k may not divide."""
    fu = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((1, 5, h, w)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    want = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad, clamp=256.0)
    got = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad, clamp=256.0,
                         impl="packed")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_up4_forward_and_grad(rng):
    """Production up4/down2 geometry, forward + VJP vs the composed op."""
    up, down, h, w, pad = CASES[4]
    fu = design_kaiser_lowpass(24, 1.0, 4.0, 16.0)  # up4 uses a longer filter
    fd = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((1, 3, h, w)).astype(np.float32))
    want = filtered_lrelu(x, fu, fd, None, up=up, down=down, padding=pad, clamp=256.0)
    got = filtered_lrelu(x, fu, fd, None, up=up, down=down, padding=pad, clamp=256.0,
                         impl="packed")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def loss(impl):
        def f(xx):
            y = filtered_lrelu(xx, fu, fd, None, up=up, down=down, padding=pad,
                               clamp=256.0, impl=impl)
            return jnp.sum(y * jnp.sin(jnp.arange(y.size).reshape(y.shape)))
        return f

    g_ref = jax.grad(loss("conv"))(x)
    g_packed = jax.grad(loss("packed"))(x)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("up,down,h,w,pad", CASES[:2])
def test_packed_gradient_matches_composed(up, down, h, w, pad, k, rng,
                                          monkeypatch):
    monkeypatch.setenv("LVG_PACKED_K", str(k))
    from long_video_gan_tpu.ops.pallas import filtered_lrelu_packed as mod
    mod._packed_fwd_plan.cache_clear()
    mod._packed_bwd_plan.cache_clear()

    fu = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((1, 2, h, w)).astype(np.float32) * 3.0)
    b = jnp.asarray(rng.standard_normal(2).astype(np.float32))
    clamp = 4.0  # low clamp so the clamp-zero grad branch is exercised

    def loss(fn_impl):
        def f(xx):
            y = filtered_lrelu(xx, fu, fd, b, up=up, down=down, padding=pad,
                               clamp=clamp, impl=fn_impl)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return f

    g_ref = jax.grad(loss("conv"))(x)
    g_packed = jax.grad(loss("packed"))(x)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_packed_bf16_close(rng):
    fu = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    x32 = rng.standard_normal((2, 4, 20, 28)).astype(np.float32)
    b32 = rng.standard_normal(4).astype(np.float32)
    want = filtered_lrelu(jnp.asarray(x32), fu, fd, jnp.asarray(b32),
                          up=2, down=2, padding=9, clamp=256.0)
    got = filtered_lrelu(jnp.asarray(x32, jnp.bfloat16), fu, fd,
                         jnp.asarray(b32, jnp.bfloat16),
                         up=2, down=2, padding=9, clamp=256.0, impl="packed")
    assert got.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(want)))
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want)))
    assert err <= 0.05 * scale, (err, scale)


def test_packed_second_order_raises(rng):
    fu = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 16)).astype(np.float32))

    def inner(xx):
        y = filtered_lrelu(xx, fu, fd, None, up=2, down=2, padding=8,
                           clamp=256.0, impl="packed")
        return jnp.sum(jnp.square(y))

    def outer(xx):
        g = jax.grad(inner)(xx)
        return jnp.sum(jnp.square(g))  # R1-style double backward

    with pytest.raises(NotImplementedError, match="first-order"):
        jax.grad(outer)(x)
