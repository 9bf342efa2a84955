"""Tests for DiffAugment and the ADA AugmentPipe."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.models.ada_augment import AugmentPipe
from long_video_gan_tpu.models.diff_augment import diff_augment

from conftest import has_reference, import_reference


def test_diff_augment_shape_and_grad(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 8, 12)).astype(np.float32))
    y = diff_augment(jax.random.key(0), x)
    assert y.shape == x.shape
    g = jax.grad(lambda x: jnp.sum(diff_augment(jax.random.key(0), x) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_diff_augment_consistent_across_frames(rng):
    """Each clip gets ONE transform applied to every frame: a clip with
    identical frames must stay frame-constant after augmentation."""
    frame = rng.standard_normal((2, 3, 1, 8, 12)).astype(np.float32)
    x = jnp.asarray(np.repeat(frame, 4, axis=2))
    y = diff_augment(jax.random.key(1), x)
    ref = y[:, :, :1]
    np.testing.assert_allclose(np.asarray(y), np.asarray(np.repeat(np.asarray(ref), 4, axis=2)),
                               rtol=1e-5, atol=1e-6)


def test_ada_p_zero_geometry_is_identity(rng):
    """With p=0 every stochastic gate turns off, so the pipe is the identity
    (up to the up/down resampling round trip of the geometric stage)."""
    pipe = AugmentPipe(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
                       brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)
    x = jnp.asarray(rng.standard_normal((2, 3, 2, 16, 16)).astype(np.float32))
    y = pipe(jax.random.key(0), x, p=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3, atol=1e-3)


def test_ada_differentiable(rng):
    pipe = AugmentPipe(xflip=1, scale=1, rotate=1, brightness=1, saturation=1,
                       noise=1, cutout=1)
    x = jnp.asarray(rng.standard_normal((2, 3, 2, 12, 16)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(pipe(jax.random.key(0), x, p=0.7) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_ada_in_augment_config_runs(rng):
    """The sres input-corruption config (video_gan_sres.py:122-136)."""
    s = 8.0
    pipe = AugmentPipe(scale=1, scale_std=0.01 * s, rotate=1, rotate_max=0.002 * s,
                       aniso=1, aniso_std=0.01 * s, xfrac=1, xfrac_std=0.002 * s,
                       noise=1, noise_std=0.01 * s)
    x = jnp.asarray(rng.standard_normal((2, 3, 12, 9, 16)).astype(np.float32))
    y = pipe(jax.random.key(3), x, p=0.5)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
@pytest.mark.parametrize("percentile", [0.35, 0.5, 0.62])
def test_ada_matches_torch_reference_debug_mode(percentile, rng):
    """debug_percentile pins every augmentation parameter, so both pipelines
    become deterministic and comparable. Config mirrors train_sres
    (geometric + color; imgfilter/noise excluded: the reference's imgfilter is
    inconsistent for videos and noise draws random values even in debug mode)."""
    import torch

    ref_mod = import_reference("model.ada_augment")
    cfg = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
               brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1, cutout=1)
    pipe_t = ref_mod.AugmentPipe(**cfg)
    pipe_t.p.fill_(0.8)
    pipe = AugmentPipe(**cfg)

    x = rng.standard_normal((2, 3, 2, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = pipe_t(torch.from_numpy(x), debug_percentile=percentile).numpy()
    got = np.asarray(pipe(jax.random.key(0), jnp.asarray(x), p=0.8,
                          debug_percentile=percentile))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
