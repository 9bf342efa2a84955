"""Per-block rematerialization (block_remat) must be a pure memory/compute
trade: identical outputs, gradients, and ema-variable updates vs the plain
path, with the same variable tree (checkpoints interchangeable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def _tiny_lres(**kw):
    from long_video_gan_tpu.models.generator_lres import VideoGenerator

    return VideoGenerator(
        temporal_emb_dim=32, latent_w_dim=32, temporal_padding=2,
        channel_max=16, out_height=18, out_width=32,
        embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40,
                              blur_widths=8),
        **kw)


def test_lres_block_remat_identical(rng):
    G0 = _tiny_lres()
    G1 = _tiny_lres(block_remat=True)
    seq = 4
    variables = G0.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, seq)
    # Same variable tree: the remat wrapper is variable-transparent.
    assert jax.tree_util.tree_structure(
        G1.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, seq)
    ) == jax.tree_util.tree_structure(variables)

    in_len = G0.compute_seq_lengths(seq)[0]
    emb_len = in_len * G0.total_temporal_scale
    noise = jnp.asarray(rng.standard_normal(
        (1, G0.noise_channels, emb_len + G0.noise_kernel_size - 1)).astype(np.float32))

    def loss(G, params):
        v = {**variables, "params": params}
        out, new_vars = G.apply(v, 1, seq, magnitude_ema_beta=0.9, noise=noise,
                                mutable=["ema"])
        return jnp.sum(jnp.square(out)), new_vars["ema"]

    (l0, ema0), g0 = jax.value_and_grad(lambda p: loss(G0, p), has_aux=True)(
        variables["params"])
    (l1, ema1), g1 = jax.value_and_grad(lambda p: loss(G1, p), has_aux=True)(
        variables["params"])

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # Recompute changes XLA fusion boundaries -> fp reassociation noise only.
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
                 g0, g1)
    # ema updates flow out of the remat wrapper identically.
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), ema0, ema1)
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        ema1, variables["ema"]))
    assert any(changed), "magnitude emas did not update under block_remat"


def test_sres_block_remat_identical(rng):
    from long_video_gan_tpu.models.generator_sres import VideoGenerator

    kw = dict(hr_height=36, hr_width=64, lr_height=9, lr_width=16,
              temporal_context=2, latent_z_dim=16, latent_w_dim=16,
              margin_size=4, num_fp16_res=0, num_layers=6, channel_max=16,
              channel_base=1024)
    G0 = VideoGenerator(**kw)
    G1 = VideoGenerator(block_remat=True, **kw)

    lr = jnp.asarray(rng.standard_normal((1, 3, 6, 9, 16)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32))
    variables = G0.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, lr)

    def loss(G, params):
        v = {**variables, "params": params}
        out, new_vars = G.apply(v, lr, z=z, magnitude_ema_beta=0.9, mutable=["ema"])
        return jnp.sum(jnp.square(out)), new_vars["ema"]

    (l0, ema0), g0 = jax.value_and_grad(lambda p: loss(G0, p), has_aux=True)(
        variables["params"])
    (l1, ema1), g1 = jax.value_and_grad(lambda p: loss(G1, p), has_aux=True)(
        variables["params"])

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # Recompute changes XLA fusion boundaries -> fp reassociation noise only.
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
                 g0, g1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), ema0, ema1)
