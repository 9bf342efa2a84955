"""Fused bias + activation (+ gain + clamp).

TPU-native design: on GPU the reference needs a custom CUDA kernel
(torch_utils/ops/bias_act.{cu,cpp}) because eager PyTorch would materialize
each pointwise step. Under `jax.jit` the whole chain is one fused XLA
elementwise computation that rides the VPU and fuses into the neighbouring
conv/matmul epilogue, so a plain jnp expression *is* the fast path. First and
second order gradients (needed by R1's double backward) come from JAX autodiff;
no hand-written grad kernels (reference: bias_act.py:142-203) are required.

Activation table mirrors the reference (torch_utils/ops/bias_act.py:21-31):
name -> (fn, default alpha, default gain).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ActivationSpec:
    func: Callable
    def_alpha: float
    def_gain: float


_SQRT2 = math.sqrt(2.0)

activation_funcs: dict[str, ActivationSpec] = {
    "linear": ActivationSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": ActivationSpec(lambda x, alpha: jax.nn.relu(x), 0.0, _SQRT2),
    "lrelu": ActivationSpec(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, _SQRT2),
    "tanh": ActivationSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActivationSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActivationSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActivationSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, _SQRT2),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Add per-channel bias `b` along axis `dim`, apply `act`, scale by `gain`,
    clamp to `[-clamp, clamp]`. Same contract as the reference's bias_act
    (torch_utils/ops/bias_act.py:52-120); supports arbitrary-order gradients.
    """
    assert clamp is None or clamp >= 0
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1, "bias must be 1-D"
        assert 0 <= dim < x.ndim
        assert b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
