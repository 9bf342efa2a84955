"""Temporal (sequence) sharding exactness: the time-sharded lres synthesis
must reproduce the unsharded synthesis bit-for-bit (up to conv numerics) in
every shard's interior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.models.generator_lres import VideoGenerator
from long_video_gan_tpu.parallel.mesh import create_mesh
from long_video_gan_tpu.parallel.temporal import (
    _window_video_from_noise,
    synthesize_time_sharded,
)


@pytest.fixture(scope="module")
def G_and_vars():
    G = VideoGenerator(out_height=8, out_width=16, temporal_emb_dim=64, latent_w_dim=64,
                       temporal_padding=2, channel_max=16,
                       embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40,
                                             blur_widths=16))
    variables = G.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, 8)
    return G, variables


def test_time_sharded_synthesis_matches_full(G_and_vars):
    G, variables = G_and_vars
    scale = G.total_temporal_scale
    mesh = create_mesh(jax.devices()[:4], axis_names=("time",), shape=(4,))
    num_shards = 4
    shard_len = scale            # minimal aligned shard
    seq_length = shard_len * num_shards
    halo = 8 * scale

    rng = jax.random.key(7)
    sharded = synthesize_time_sharded(G, variables, batch_size=1,
                                      seq_length=seq_length, mesh=mesh, rng=rng,
                                      halo=halo)
    assert sharded.shape == (1, 3, seq_length, 8, 16)

    # Unsharded oracle: synthesize the covering window from the SAME noise
    # stream and take its interior.
    in_len_w = G.compute_seq_lengths(shard_len + 2 * halo)[0]
    noise_len_w = in_len_w * scale + G.noise_kernel_size - 1
    total_noise = (num_shards - 1) * shard_len + noise_len_w
    noise = jax.random.normal(rng, (1, G.noise_channels, total_noise),
                              jnp.float32)
    full = _window_video_from_noise(G, variables, noise, seq_length + 2 * halo)
    want = full[:, :, halo:halo + seq_length]

    np.testing.assert_allclose(np.asarray(sharded), np.asarray(want),
                               rtol=1e-4, atol=2e-6)


def test_time_sharded_rejects_misaligned_length(G_and_vars):
    G, variables = G_and_vars
    mesh = create_mesh(jax.devices()[:2], axis_names=("time",), shape=(2,))
    with pytest.raises(AssertionError):
        synthesize_time_sharded(G, variables, 1, seq_length=48, mesh=mesh,
                                rng=jax.random.key(0))
