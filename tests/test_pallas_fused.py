"""Fused whole-image filtered_lrelu kernel (v3): forward + custom-VJP
exactness vs the composed op (interpret mode on the CPU suite; the same
kernel compiles for TPU via Mosaic)."""

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

    # ops/__init__ re-exports the function under the module's name, so plain
    # attribute-style imports resolve to the function; fetch the module.
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
]


@pytest.mark.parametrize("up,down,h,w,pad", CASES)
def test_fused_forward_matches_composed(up, down, h, w, pad, rng):
    fu = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((2, 3, h, w)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    want = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad, clamp=256.0)
    got = filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=pad, clamp=256.0,
                         impl="fused")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_torgb_identity_case(rng):
    # up == down == 1 with trivial filters routes to the composed path.
    x = jnp.asarray(rng.standard_normal((2, 3, 9, 11)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    want = filtered_lrelu(x, None, None, b, up=1, down=1, padding=0,
                          gain=1.0, slope=1.0, clamp=256.0)
    got = filtered_lrelu(x, None, None, b, up=1, down=1, padding=0,
                         gain=1.0, slope=1.0, clamp=256.0, impl="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("up,down,h,w,pad", CASES[:2])
def test_fused_gradient_matches_composed(up, down, h, w, pad, rng):
    """Custom VJP vs autodiff through the composed op (clamp active for some
    elements so the clamp-zero branch is exercised)."""
    fu = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((1, 2, h, w)).astype(np.float32) * 3.0)
    b = jnp.asarray(rng.standard_normal(2).astype(np.float32))
    clamp = 4.0  # low clamp so a good fraction of elements saturate

    def loss(fn_impl):
        def f(xx):
            y = filtered_lrelu(xx, fu, fd, b, up=up, down=down, padding=pad,
                               clamp=clamp, impl=fn_impl)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return f

    g_ref = jax.grad(loss("conv"))(x)
    g_fused = jax.grad(loss("fused"))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_bias_gradient(rng):
    """Bias add stays outside the kernel; its grad must flow."""
    fu = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 16)).astype(np.float32))

    def loss_b(bb, impl):
        y = filtered_lrelu(x, fu, fd, bb, up=2, down=2, padding=8, clamp=256.0,
                           impl=impl)
        return jnp.sum(jnp.square(y))

    b0 = jnp.asarray(rng.standard_normal(2).astype(np.float32))
    g_ref = jax.grad(lambda bb: loss_b(bb, "conv"))(b0)
    g_fused = jax.grad(lambda bb: loss_b(bb, "fused"))(b0)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_bf16_close(rng):
    """bfloat16 path stays within bf16 tolerance of the f32 composed op."""
    fu = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(12, 1.0, 2.0, 8.0)
    x32 = rng.standard_normal((2, 4, 20, 28)).astype(np.float32)
    b32 = rng.standard_normal(4).astype(np.float32)
    want = filtered_lrelu(jnp.asarray(x32), fu, fd, jnp.asarray(b32),
                          up=2, down=2, padding=9, clamp=256.0)
    got = filtered_lrelu(jnp.asarray(x32, jnp.bfloat16), fu, fd,
                         jnp.asarray(b32, jnp.bfloat16),
                         up=2, down=2, padding=9, clamp=256.0, impl="fused")
    assert got.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(want)))
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want)))
    assert err <= 0.05 * scale, (err, scale)


def test_fused_second_order_raises(rng):
    """The fused kernel is structurally first-order-only: a second
    differentiation through its VJP must raise a clear NotImplementedError
    (pointing at impl='matrix'), not silently mis-differentiate."""
    fu = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    fd = design_kaiser_lowpass(8, 1.0, 2.0, 8.0)
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 16)).astype(np.float32))

    def inner(xx):
        y = filtered_lrelu(xx, fu, fd, None, up=2, down=2, padding=8,
                           clamp=256.0, impl="fused")
        return jnp.sum(jnp.square(y))

    def outer(xx):
        g = jax.grad(inner)(xx)
        return jnp.sum(jnp.square(g))  # R1-style double backward

    with pytest.raises(NotImplementedError, match="first-order"):
        jax.grad(outer)(x)
