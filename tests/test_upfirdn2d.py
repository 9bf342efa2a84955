"""Golden tests for upfirdn2d against an independent numpy oracle and
(optionally) the PyTorch reference implementation."""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from long_video_gan_tpu.ops.upfirdn2d import (
    downsample2d, filter2d, parse_padding, parse_scaling, upfirdn2d, upsample2d,
)
from long_video_gan_tpu.ops import setup_filter

from conftest import has_reference


def numpy_upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1.0):
    """Direct numpy oracle: zero-stuff, pad/crop, convolve, decimate."""
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    f = np.ones([1, 1], np.float32) if f is None else np.asarray(f, np.float64)
    if f.ndim == 1:
        f = np.outer(f, f)
        eff_gain = gain  # separable applied twice => gain ** (1/2) each
    else:
        eff_gain = gain

    n, c, h, w = x.shape
    # Zero-stuff upsample (each sample followed by up-1 zeros).
    up_buf = np.zeros([n, c, h * upy, w * upx], dtype=np.float64)
    up_buf[:, :, ::upy, ::upx] = x
    # Pad / crop.
    out_h = h * upy + py0 + py1
    out_w = w * upx + px0 + px1
    buf = np.zeros([n, c, out_h, out_w], dtype=np.float64)
    ys = slice(max(py0, 0), max(py0, 0) + h * upy - max(-py0, 0) - max(-py1, 0))
    xs = slice(max(px0, 0), max(px0, 0) + w * upx - max(-px0, 0) - max(-px1, 0))
    src_y = slice(max(-py0, 0), h * upy - max(-py1, 0))
    src_x = slice(max(-px0, 0), w * upx - max(-px1, 0))
    buf[:, :, ys, xs] = up_buf[:, :, src_y, src_x]
    # Convolve (flip unless flip_filter -> convolution by default).
    k = f if flip_filter else f[::-1, ::-1]
    k = k * eff_gain
    out = np.zeros([n, c, out_h - f.shape[0] + 1, out_w - f.shape[1] + 1])
    for i in range(n):
        for j in range(c):
            out[i, j] = scipy.signal.convolve2d(buf[i, j], k[::-1, ::-1], mode="valid")
    # Decimate.
    return out[:, :, ::downy, ::downx]


CASES = [
    dict(up=1, down=1, padding=0, f_taps=4, separable=False),
    dict(up=2, down=1, padding=(1, 2, 0, 3), f_taps=4, separable=False),
    dict(up=1, down=2, padding=2, f_taps=4, separable=False),
    dict(up=2, down=2, padding=3, f_taps=6, separable=True),
    dict(up=(2, 1), down=(1, 2), padding=(2, 1, 3, 0), f_taps=8, separable=True),
    dict(up=1, down=1, padding=(-1, 2, 0, -1), f_taps=3, separable=False),
    dict(up=4, down=1, padding=5, f_taps=12, separable=True),
    dict(up=1, down=1, padding=1, f_taps=None, separable=False),  # identity filter
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("impl", ["conv", "matrix"])
@pytest.mark.parametrize("flip_filter", [False, True])
def test_upfirdn2d_matches_numpy_oracle(case, impl, flip_filter, rng):
    if impl == "matrix" and case["f_taps"] is not None and not case["separable"]:
        pytest.skip("matrix impl falls back to conv for full 2-D filters")
    x = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)
    if case["f_taps"] is None:
        f = None
    elif case["separable"]:
        f = rng.standard_normal(case["f_taps"]).astype(np.float32)
    else:
        f = rng.standard_normal((case["f_taps"], case["f_taps"])).astype(np.float32)
    gain = 1.5
    got = upfirdn2d(jnp.asarray(x), f, up=case["up"], down=case["down"],
                    padding=case["padding"], flip_filter=flip_filter, gain=gain, impl=impl)
    want = numpy_upfirdn2d(x, f, up=case["up"], down=case["down"],
                           padding=case["padding"], flip_filter=flip_filter, gain=gain)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fn,kwargs", [
    (upsample2d, dict(up=2)),
    (downsample2d, dict(down=2)),
    (filter2d, dict()),
])
def test_wrappers_shapes(fn, kwargs, rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 12)).astype(np.float32))
    f = setup_filter([1, 3, 3, 1])
    y = fn(x, f, **kwargs)
    if fn is upsample2d:
        assert y.shape == (1, 2, 16, 24)
    elif fn is downsample2d:
        assert y.shape == (1, 2, 4, 6)
    else:
        assert y.shape == x.shape


def test_upsample_preserves_dc(rng):
    # A constant signal upsampled with a normalized filter stays constant
    # (gain=up**2 per axis pair handled by the wrapper).
    x = jnp.ones((1, 1, 8, 8), jnp.float32) * 3.0
    f = setup_filter(np.ones(8) / 8 * 8)  # normalized inside setup_filter
    y = upsample2d(x, f, up=2)
    np.testing.assert_allclose(np.asarray(y[:, :, 4:-4, 4:-4]), 3.0, rtol=1e-5)


def test_gradients_match_between_impls(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 6, 7)).astype(np.float32))
    f = rng.standard_normal(8).astype(np.float32)

    def loss(impl):
        def fn(x):
            y = upfirdn2d(x, f, up=2, down=2, padding=4, impl=impl)
            return jnp.sum(jnp.sin(y) ** 2)
        return fn

    g_conv = jax.grad(loss("conv"))(x)
    g_mat = jax.grad(loss("matrix"))(x)
    np.testing.assert_allclose(np.asarray(g_conv), np.asarray(g_mat), rtol=1e-4, atol=1e-5)

    # Second-order (R1 requires grad-of-grad through resampling ops).
    def second(x):
        g = jax.grad(lambda z: jnp.sum(upfirdn2d(z, f, up=2, padding=4) ** 2))(x)
        return jnp.sum(g ** 2)

    hg = jax.grad(second)(x)
    assert np.isfinite(np.asarray(hg)).all()


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("case", CASES[:6])
def test_upfirdn2d_matches_torch_reference(case, rng):
    import torch
    from conftest import import_reference
    _upfirdn2d_ref = import_reference("torch_utils.ops.upfirdn2d")._upfirdn2d_ref

    x = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)
    if case["f_taps"] is None:
        f_t, f_j = None, None
    elif case["separable"]:
        f = rng.standard_normal(case["f_taps"]).astype(np.float32)
        f_t, f_j = torch.from_numpy(f), f
    else:
        f = rng.standard_normal((case["f_taps"], case["f_taps"])).astype(np.float32)
        f_t, f_j = torch.from_numpy(f), f

    want = _upfirdn2d_ref(torch.from_numpy(x), f_t, up=case["up"], down=case["down"],
                          padding=case["padding"], gain=2.0).numpy()
    got = upfirdn2d(jnp.asarray(x), f_j, up=case["up"], down=case["down"],
                    padding=case["padding"], gain=2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
