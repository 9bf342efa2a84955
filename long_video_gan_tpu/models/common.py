"""Shared model building blocks (both GAN stages).

Conventions:
  * Tensors are NCTHW (videos) / NCHW (frames) / NCT (temporal streams), same
    as the reference, so shape contracts can be checked line-by-line.
  * Parameter names and layouts match the reference torch modules 1:1
    (weight [out, in], bias [out]) so the pickle converter is a pure rename.
  * FIR filters are static numpy constants computed at module-build time; they
    are not parameters or buffers (they are deterministic from config).
  * Mutable magnitude EMA statistics live in the flax variable collection
    "ema"; cross-device averaging is implicit because a global `jnp.mean`
    over a pjit-sharded batch reduces over all devices (replacing the
    reference's eager per-layer all_reduce, model/generator_lres.py:304-312).
"""

from __future__ import annotations

import math
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import activation_funcs, bias_act
from ..ops.filters import kaiser_resample_filter, tent_filter
from ..ops.upfirdn2d import downsample2d, upsample2d


def normalize_2nd_moment(x: jax.Array, axis: Union[int, tuple] = 1, eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2, axis) + eps) — reference: model/generator_lres.py:76-77."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def center_crop(x: jax.Array, width: Optional[int] = None, height: Optional[int] = None,
                seq_length: Optional[int] = None) -> jax.Array:
    """Center-crop NCT / NCTHW tensors (reference: model/generator_lres.py:131-155)."""
    assert x.ndim in (3, 5)
    if width is not None:
        assert x.ndim == 5
        x0 = (x.shape[4] - width) // 2
        x = x[:, :, :, :, x0:x0 + width]
    if height is not None:
        assert x.ndim == 5
        y0 = (x.shape[3] - height) // 2
        x = x[:, :, :, y0:y0 + height]
    if seq_length is not None:
        t0 = (x.shape[2] - seq_length) // 2
        x = x[:, :, t0:t0 + seq_length]
    return x


# ---------------------------------------------------------------------------


class FullyConnectedLayer(nn.Module):
    """Equalized-lr fully connected layer (reference: generator_lres.py:394-436).

    weight stored as randn * weight_std_init / lrate_mul, runtime-scaled by
    lrate_mul / sqrt(in_features); bias stored as bias_init / lrate_mul,
    runtime-scaled by lrate_mul.
    """

    in_features: int
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lrate_mul: float = 1.0
    weight_std_init: float = 1.0
    bias_init: float = 0.0

    def setup(self):
        assert self.activation in activation_funcs
        std = self.weight_std_init / self.lrate_mul
        self.weight = self.param(
            "weight", lambda k: jax.random.normal(k, (self.out_features, self.in_features)) * std
        )
        if self.use_bias:
            self.bias = self.param(
                "bias",
                lambda k: jnp.full((self.out_features,), self.bias_init / self.lrate_mul, jnp.float32),
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        weight_gain = self.lrate_mul / math.sqrt(self.in_features)
        w = (self.weight * weight_gain).astype(x.dtype)
        y = x @ w.T
        b = None
        if self.use_bias:
            b = self.bias * self.lrate_mul if self.lrate_mul != 1 else self.bias
            b = b.astype(x.dtype)
        return bias_act(y, b, dim=y.ndim - 1, act=self.activation)


# ---------------------------------------------------------------------------


class MagnitudeEMA(nn.Module):
    """Running mean of activation magnitude; returns rsqrt gain.

    Reference: model/generator_lres.py:297-315. `beta` must be a static Python
    float: beta == 1.0 reads the EMA without updating (G phase); beta < 1
    updates it from the current global batch mean (D phase). The variable lives
    in the "ema" collection, so callers choose mutability via
    `apply(..., mutable=["ema"])`.
    """

    @nn.compact
    def __call__(self, x: jax.Array, beta: float = 1.0) -> jax.Array:
        ema = self.variable("ema", "magnitude_ema", lambda: jnp.ones((), jnp.float32))
        if beta != 1.0:
            mag = jnp.mean(jnp.square(jax.lax.stop_gradient(x).astype(jnp.float32)))
            ema.value = ema.value + (1.0 - beta) * (mag - ema.value)
        return jax.lax.rsqrt(ema.value)


# ---------------------------------------------------------------------------
# Static resamplers. These hold no parameters — just precomputed FIR taps —
# so they are plain callables, not flax modules.


def _pad_edge(x, axis_pads):
    return jnp.pad(x, axis_pads, mode="edge")


class SpatialBilinearUpsample:
    """x2 (or xN) bilinear spatial upsampling of NCTHW videos.

    Reference: model/generator_lres.py:177-189. Time folds into channels so the
    2-D resampler sees [N, C*T, H, W].
    """

    def __init__(self, scale: int = 2, padding: int = 0, impl: str = "conv"):
        self.scale = scale
        self.padding = padding
        self.impl = impl
        self.filter = tent_filter(scale)

    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 5
        n, c, t, h, w = x.shape
        x = x.reshape(n, c * t, h, w)
        if self.padding > 0:
            x = _pad_edge(x, [(0, 0), (0, 0), (self.padding, self.padding), (self.padding, self.padding)])
        x = upsample2d(x, self.filter, up=self.scale, padding=-self.padding * self.scale, impl=self.impl)
        return x.reshape(n, c, t, x.shape[2], x.shape[3])


class _TemporalResample:
    """Shared machinery: apply a 1-D filter along the T axis of NCT / NCTHW.

    Space folds into the last axis so the 2-D resampler sees [N, C, T, H*W]
    and filters along its H dimension (reference: generator_lres.py:192-291).
    """

    filter: np.ndarray
    scale: int
    padding: int

    def _apply(self, x: jax.Array, up: bool, impl: str = "conv") -> jax.Array:
        ndim = x.ndim
        assert ndim in (3, 5)
        if ndim == 5:
            n, c, t, h, w = x.shape
            x = x.reshape(n, c, t, h * w)
        else:
            x = x[..., None]

        f = self.filter.reshape(-1, 1)  # [taps, 1] — filter along the T (H) axis
        if up:
            if self.padding > 0:
                x = _pad_edge(x, [(0, 0), (0, 0), (self.padding, self.padding), (0, 0)])
            x = upsample2d(x, f, up=(1, self.scale), padding=(0, -self.padding * self.scale), impl=impl)
        else:
            pad = self.padding * self.scale
            if self.padding > 0:
                x = _pad_edge(x, [(0, 0), (0, 0), (pad, pad), (0, 0)])
            x = downsample2d(x, f, down=(1, self.scale), padding=(0, -pad), impl=impl)

        if ndim == 5:
            return x.reshape(n, c, x.shape[2], h, w)
        return x[..., 0]


class TemporalLinearUpsample(_TemporalResample):
    def __init__(self, scale: int = 2, padding: int = 0):
        self.scale, self.padding = scale, padding
        self.filter = tent_filter(scale)

    def __call__(self, x):
        return self._apply(x, up=True)


class TemporalLinearDownsample(_TemporalResample):
    def __init__(self, scale: int = 2, padding: int = 0):
        self.scale, self.padding = scale, padding
        self.filter = tent_filter(scale)

    def __call__(self, x):
        return self._apply(x, up=False)


class TemporalKaiserDownsample(_TemporalResample):
    def __init__(self, scale: int = 2, padding: int = 0, filter_size: int = 6,
                 cutoff: float = 1.0, width: float = 6.0, sampling_rate: float = 4.0):
        self.scale, self.padding = scale, padding
        self.filter = kaiser_resample_filter(scale, filter_size, cutoff, width, sampling_rate)

    def __call__(self, x):
        return self._apply(x, up=False)
