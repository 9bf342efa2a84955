"""lres discriminator mixed-precision path (num_fp16_res > 0).

The reference lres D exposes the same per-block fp16 ladder as its sres D
(reference model/discriminator_lres.py:432-445, torch.float16 cast at :323)
but the released recipe never enables it; on TPU it is the measured lever for
the D-dominated lres step (BASELINE.md round 5). These tests pin the bf16
path's numerics so the opt-in flag (`train_lres.py --d-fp16-res`) is safe.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.models.discriminator_lres import VideoDiscriminator

CFG = dict(seq_length=8, max_edge=32, channels_max=32,
           epilogue_kwargs=dict(channels=64))


def _make(num_fp16_res):
    D = VideoDiscriminator(num_fp16_res=num_fp16_res, **CFG)
    video = jax.random.normal(jax.random.key(1), (2, 3, 8, 18, 32), jnp.float32)
    variables = D.init({"params": jax.random.key(0)}, video)
    return D, variables, video


def test_fp16_forward_finite_and_f32_out():
    D, variables, video = _make(num_fp16_res=4)
    out = D.apply(variables, video)
    assert out.shape == (2, 1)
    assert out.dtype == jnp.float32  # epilogue runs in f32 regardless of blocks
    assert bool(jnp.isfinite(out).all())


def test_fp16_matches_f32_loosely():
    # Same params, same input: the bf16 block ladder must agree with the f32
    # path within bf16 round-off accumulated over 4 residual blocks.
    D32, variables, video = _make(num_fp16_res=0)
    D16 = VideoDiscriminator(num_fp16_res=4, **CFG)
    want = np.asarray(D32.apply(variables, video))
    got = np.asarray(D16.apply(variables, video))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_fp16_r1_double_backward_finite():
    # The full R1 path: r1 = ||grad_x D(x)||^2 differentiated wrt params —
    # grad-of-grad through the bf16 casts (train/gan_lres.update_r1).
    D = VideoDiscriminator(num_fp16_res=4, **CFG)
    video = jax.random.normal(jax.random.key(3), (1, 3, 8, 18, 32), jnp.float32)
    variables = D.init({"params": jax.random.key(0)}, video)

    def r1(params):
        def score(v):
            return jnp.sum(D.apply({"params": params}, v))

        g = jax.grad(score)(video)
        return jnp.sum(jnp.square(g))

    grads = jax.grad(r1)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0.0 for g in leaves)


@pytest.mark.parametrize("num_fp16_res", [2, 4])
def test_fp16_input_grad_finite(num_fp16_res):
    # The R1 penalty differentiates D wrt its input video; the grad must flow
    # through the bf16 casts without inf/nan (reference computes the same
    # penalty through its fp16 blocks, model/video_gan_lres.py:180-204).
    D = VideoDiscriminator(num_fp16_res=num_fp16_res, **CFG)
    video = jax.random.normal(jax.random.key(2), (1, 3, 8, 18, 32), jnp.float32)
    variables = D.init({"params": jax.random.key(0)}, video)

    def loss(v):
        return jnp.sum(D.apply(variables, v))

    g = jax.grad(loss)(video)
    assert g.dtype == jnp.float32
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.0
