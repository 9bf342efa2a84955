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


def test_prep_cond_matches_unfold_first_formulation():
    """prep_cond resamples raw frames once per DISTINCT scale, then crops and
    unfolds; the reference unfolds the temporal window into channels first and
    resamples per layer (generator_sres.py:581-610). Spatial resampling is
    per-channel-plane and linear, so the two orders must agree exactly."""
    from long_video_gan_tpu.models.generator_sres import Generator

    G = Generator(z_dim=32, w_dim=32, img_width=128, img_height=72,
                  img_channels=3, cond_width=32, cond_height=18,
                  cond_context=2, num_layers=6, resample_impl="conv")
    rng = np.random.default_rng(0)
    n, c, t = 2, 3, 9
    cond = jnp.asarray(rng.standard_normal((n, c, t, 18, 32)).astype(np.float32))

    bound = G.bind({})  # prep_cond uses no params
    conds_new = bound.prep_cond(cond)

    # Reference formulation: pad -> unfold-first -> per-layer resample -> crop/pad.
    edge = max(G.cond_width, G.cond_height)
    m = G.margin_size
    px0 = (edge - G.cond_width) // 2 + m
    px1 = (edge - G.cond_width + 1) // 2 + m
    py0 = (edge - G.cond_height) // 2 + m
    py1 = (edge - G.cond_height + 1) // 2 + m
    condp = jnp.pad(cond, [(0, 0), (0, 0), (0, 0), (py0, py1), (px0, px1)], mode="edge")
    s = 1 + 2 * G.cond_context
    t_out = t - s + 1
    idx = np.arange(t_out)[:, None] + np.arange(s)[None, :]
    w6 = condp[:, :, idx].transpose(0, 2, 1, 3, 4, 5)
    cond2d = w6.reshape(n * t_out, c * s, condp.shape[3], condp.shape[4])
    plan = bound.synthesis.plan()
    sx, sy = plan["sizes_x"], plan["sizes_y"]

    # At least one scale must be shared across layers for the dedup to be
    # exercised (the production plan shares every scale).
    assert len(set(bound._resample_keys)) < len(bound._resample_keys)

    for i, key in enumerate(bound._resample_keys):
        lc = bound._resample_by_key[key](cond2d)
        prev = max(i - 1, 0)
        in_w, in_h = int(sx[prev]), int(sy[prev])
        x0 = max(0, (lc.shape[3] - in_w) // 2)
        y0 = max(0, (lc.shape[2] - in_h) // 2)
        lc = lc[:, :, y0:y0 + in_h, x0:x0 + in_w]
        pxa = (in_w - lc.shape[3]) // 2
        pxb = (in_w - lc.shape[3] + 1) // 2
        pya = (in_h - lc.shape[2]) // 2
        pyb = (in_h - lc.shape[2] + 1) // 2
        if pxa or pxb or pya or pyb:
            lc = jnp.pad(lc, [(0, 0), (0, 0), (pya, pyb), (pxa, pxb)], mode="edge")
        np.testing.assert_allclose(np.asarray(lc), np.asarray(conds_new[i]),
                                   rtol=0, atol=1e-6)


def test_sres_segment_prefetch_matches_serial(sres):
    """Dispatch-ahead prefetch must not change the streamed segments."""
    G, variables = sres
    lr = jax.random.normal(jax.random.key(3), (1, 3, 16, 9, 16))  # T_out = 12
    z = jax.random.normal(jax.random.key(4), (1, 32))
    apply_fn = jax.jit(lambda v, w, z: G.apply(v, w, z=z))
    serial = [np.asarray(s) for s in sample_video_segments(
        apply_fn, variables, lr, segment_length=4, temporal_context=2, z=z,
        prefetch=0)]
    ahead = [np.asarray(s) for s in sample_video_segments(
        apply_fn, variables, lr, segment_length=4, temporal_context=2, z=z,
        prefetch=3)]
    assert len(serial) == len(ahead) == 3
    for a, b in zip(serial, ahead):
        np.testing.assert_array_equal(a, b)
