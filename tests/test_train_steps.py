"""Train-step tests on the virtual 8-device CPU mesh: both GAN stages run
their full update cycle (G, D, R1, ADA, EMA) with the batch sharded over the
mesh and produce finite losses and changed parameters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from long_video_gan_tpu.train.gan_lres import LowResVideoGAN
from long_video_gan_tpu.train.gan_sres import SuperResVideoGAN
from long_video_gan_tpu.train.stats import Collector

LRES_CFG = dict(
    seq_length=8, height=18, width=32, total_batch=8,
    G_random_temp_translate=True, temp_scale_augment=1.0,
    G_kwargs=dict(temporal_emb_dim=64, latent_w_dim=64, temporal_padding=2, channel_max=32,
                  embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40,
                                        blur_widths=16)),
    D_kwargs=dict(channels_max=32, epilogue_kwargs=dict(channels=64)),
    G_grad_accum=2, D_grad_accum=2,
)

SRES_CFG = dict(
    seq_length=2, temporal_context=2, lr_height=9, lr_width=16,
    hr_height=36, hr_width=64, total_batch=8,
    G_kwargs=dict(latent_z_dim=32, latent_w_dim=32, margin_size=4, num_fp16_res=0,
                  channel_base=1024, channel_max=32, num_layers=6),
    D_kwargs=dict(channels_base=512, channels_max=32, num_fp16_res=0),
    augment_kwargs=dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                        xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                        saturation=1),
)


def params_delta(a, b):
    return max(float(jnp.abs(x - y).max()) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


@pytest.fixture(scope="module")
def mesh():
    return create_mesh()


def test_lres_full_step_cycle(mesh):
    gan = LowResVideoGAN(**LRES_CFG)
    state = gan.init_state(jax.random.key(0))
    state = replicate(state, mesh)
    collector = Collector()

    real = shard_batch(
        jnp.asarray(np.random.default_rng(0).standard_normal(
            (8, 3, 8, 18, 32)).astype(np.float32)), mesh)

    g_params_before = jax.tree.map(jnp.copy, state.G["params"])
    d_params_before = jax.tree.map(jnp.copy, state.D["params"])
    ema_before = jax.tree.map(jnp.copy, state.G_ema["params"])

    state, stats = gan.update_G(state, jax.random.key(1))
    collector.report(stats)
    state, stats = gan.update_D(state, jax.random.key(2), real)
    collector.report(stats)
    state, stats = gan.update_r1(state, jax.random.key(3), real, gain=16.0)
    collector.report(stats)
    state = gan.update_G_ema(state)
    collector.update()

    assert int(state.step) == 1
    assert params_delta(g_params_before, state.G["params"]) > 0
    assert params_delta(d_params_before, state.D["params"]) > 0
    assert params_delta(ema_before, state.G_ema["params"]) > 0
    for name in ("loss/G_loss", "loss/D_loss", "loss/r1_penalty"):
        assert np.isfinite(collector.mean(name)), name
    # magnitude EMAs moved during the D phase (fake gen with beta<1)
    assert any(float(x) != 1.0 for x in jax.tree.leaves(state.G["ema"]))


def test_sres_full_step_cycle(mesh):
    gan = SuperResVideoGAN(**SRES_CFG)
    state = gan.init_state(jax.random.key(0))
    state = replicate(state, mesh)
    collector = Collector()

    rng = np.random.default_rng(1)
    fake_lr = shard_batch(jnp.asarray(rng.standard_normal((8, 3, 6, 9, 16)).astype(np.float32)), mesh)
    real_lr = shard_batch(jnp.asarray(rng.standard_normal((8, 3, 6, 9, 16)).astype(np.float32)), mesh)
    real_hr = shard_batch(jnp.asarray(rng.standard_normal((8, 3, 2, 36, 64)).astype(np.float32)), mesh)
    r1_lr = shard_batch(jnp.asarray(rng.standard_normal((8, 3, 2, 9, 16)).astype(np.float32)), mesh)

    state, stats = gan.update_G(state, jax.random.key(1), fake_lr)
    collector.report(stats)
    state, stats = gan.update_D(state, jax.random.key(2), fake_lr, real_lr, real_hr)
    collector.report(stats)
    state, stats = gan.update_r1(state, jax.random.key(3), r1_lr, real_hr, gain=16.0)
    collector.report(stats)
    state, stats = gan.update_ada(state, gain=4.0)
    collector.report(stats)
    state = gan.update_G_ema(state)
    collector.update()

    assert int(state.step) == 1
    for name in ("loss/G_loss", "loss/D_loss", "loss/r1_penalty"):
        assert np.isfinite(collector.mean(name)), name
    # ADA controller moved p off its initial value (sign mean is +-1-ish).
    assert float(state.ada_p) != 0.0 or collector.mean("loss/D_sign_real") <= 0.6
    assert float(jnp.sum(state.sign_real_moments)) == 0.0  # reset after update_ada


def test_lres_ema_schedule_warmup():
    from long_video_gan_tpu.train.common import ema_beta_schedule

    # Early steps: much faster EMA than the asymptotic beta.
    early = float(ema_beta_schedule(jnp.asarray(0), 0.99985, 25000))
    late = float(ema_beta_schedule(jnp.asarray(10_000_000), 0.99985, 25000))
    assert early < 0.99 and abs(late - 0.99985) < 1e-6


def test_collector_window_semantics():
    from long_video_gan_tpu.train.stats import Collector, moments

    c = Collector()
    c.report({"x": moments(jnp.asarray([1.0, 2.0, 3.0]))})
    c.update()
    assert c.mean("x") == pytest.approx(2.0)
    c.report({"x": moments(jnp.asarray([10.0]))})
    c.update()
    assert c.mean("x") == pytest.approx(10.0)  # window = since last update


def test_lres_remat_matches_no_remat(mesh):
    """jax.checkpoint rematerialization must not change any numerics."""
    rng = np.random.default_rng(7)
    real = jnp.asarray(rng.standard_normal((8, 3, 8, 18, 32)).astype(np.float32))

    results = []
    for remat in (False, True):
        gan = LowResVideoGAN(**LRES_CFG, remat=remat)
        state = replicate(gan.init_state(jax.random.key(0)), mesh)
        batch = shard_batch(real, mesh)
        state, g_stats = gan.update_G(state, jax.random.key(1))
        state, d_stats = gan.update_D(state, jax.random.key(2), batch)
        results.append((
            np.asarray(jax.device_get(g_stats["loss/G_loss"])),
            np.asarray(jax.device_get(d_stats["loss/D_loss"])),
            jax.device_get(jax.tree.leaves(state.G["params"])[0]),
        ))

    (g0, d0, p0), (g1, d1, p1) = results
    np.testing.assert_allclose(g0, g1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(d0, d1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(p0, p1, rtol=1e-6, atol=1e-6)
