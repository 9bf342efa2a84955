"""Tests for the fused bias+activation op, incl. torch-reference oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.ops import activation_funcs, bias_act

from conftest import has_reference

ACTS = sorted(activation_funcs.keys())


@pytest.mark.parametrize("act", ACTS)
def test_shapes_and_defaults(act, rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    y = bias_act(x, b, dim=1, act=act)
    assert y.shape == x.shape and y.dtype == x.dtype


def test_linear_identity(rng):
    x = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(bias_act(x)), np.asarray(x))


def test_clamp_and_gain(rng):
    x = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32) * 100)
    y = bias_act(x, act="lrelu", gain=2.0, clamp=5.0)
    assert float(jnp.max(jnp.abs(y))) <= 5.0


def test_lrelu_second_order_grad(rng):
    x = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))

    def inner(x):
        g = jax.grad(lambda z: jnp.sum(bias_act(z, act="swish", clamp=10.0) ** 2))(x)
        return jnp.sum(g ** 2)

    hg = jax.grad(inner)(x)
    assert np.isfinite(np.asarray(hg)).all()


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("act", ACTS)
def test_matches_torch_reference(act, rng):
    import torch
    from conftest import import_reference
    _bias_act_ref = import_reference("torch_utils.ops.bias_act")._bias_act_ref

    x = rng.standard_normal((2, 6, 3, 3)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    want = _bias_act_ref(torch.from_numpy(x), torch.from_numpy(b), dim=1, act=act,
                         gain=1.7, clamp=3.0).numpy()
    got = bias_act(jnp.asarray(x), jnp.asarray(b), dim=1, act=act, gain=1.7, clamp=3.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)
