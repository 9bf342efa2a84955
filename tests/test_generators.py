"""Self-contained generator tests (no reference needed): shapes, determinism,
chunked inference consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.models.generator_lres import VideoGenerator as LresG
from long_video_gan_tpu.models.generator_sres import (
    VideoGenerator as SresG,
    sample_video_segments,
)


@pytest.fixture(scope="module")
def lres():
    G = LresG(out_height=18, out_width=32, temporal_emb_dim=64, latent_w_dim=64,
              temporal_padding=2, channel_max=32,
              embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40, blur_widths=16))
    variables = G.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, 8)
    return G, variables


@pytest.fixture(scope="module")
def sres():
    G = SresG(hr_height=36, hr_width=64, lr_height=9, lr_width=16, temporal_context=2,
              latent_z_dim=32, latent_w_dim=32, margin_size=4, num_fp16_res=0,
              channel_base=1024, channel_max=32, num_layers=6)
    lr = jnp.zeros((1, 3, 8, 9, 16))
    variables = G.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, lr)
    return G, variables


def test_lres_shapes_and_determinism(lres):
    G, variables = lres
    for t in (5, 8, 24):
        video = G.apply(variables, 2, t, rngs={"noise": jax.random.key(2)})
        assert video.shape == (2, 3, t, 18, 32)
        assert bool(jnp.isfinite(video).all())
    a = G.apply(variables, 1, 8, rngs={"noise": jax.random.key(5)})
    b = G.apply(variables, 1, 8, rngs={"noise": jax.random.key(5)})
    assert bool(jnp.array_equal(a, b))


def test_lres_ema_updates_only_when_beta_lt_1(lres):
    G, variables = lres
    _, updated = G.apply(variables, 1, 8, magnitude_ema_beta=0.9,
                         rngs={"noise": jax.random.key(0)}, mutable=["ema"])
    before = jax.tree.leaves(variables["ema"])
    after = jax.tree.leaves(updated["ema"])
    assert any(float(jnp.abs(x - y).max()) > 0 for x, y in zip(before, after))


def test_sres_shapes(sres):
    G, variables = sres
    lr = jax.random.normal(jax.random.key(0), (2, 3, 8, 9, 16))
    hr = G.apply(variables, lr, rngs={"noise": jax.random.key(1)})
    assert hr.shape == (2, 3, 4, 36, 64)
    assert bool(jnp.isfinite(hr).all())


def test_sres_chunked_matches_full(sres):
    """Sliding-window synthesis with shared z must equal the full-video pass on
    the same frames (the conditioning window is local, so outputs agree)."""
    G, variables = sres
    lr = jax.random.normal(jax.random.key(3), (1, 3, 12, 9, 16))  # T_out = 8
    z = jax.random.normal(jax.random.key(4), (1, 32))

    full = G.apply(variables, lr, z=z)
    apply_fn = jax.jit(lambda v, w, z: G.apply(v, w, z=z))
    segs = list(sample_video_segments(apply_fn, variables, lr, segment_length=4,
                                      temporal_context=2, z=z))
    chunked = jnp.concatenate(segs, axis=2)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=2e-4, atol=2e-4)


def test_sres_truncation(sres):
    G, variables = sres
    lr = jax.random.normal(jax.random.key(0), (1, 3, 8, 9, 16))
    z = jax.random.normal(jax.random.key(1), (1, 32))
    # psi=0 collapses every w to w_avg (zeros at init) — must still run.
    out = G.apply(variables, lr, z=z, truncation_psi=0.0)
    assert out.shape == (1, 3, 4, 36, 64)
