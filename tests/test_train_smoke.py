"""Smoke-tier trainer step: one real dp update_D + update_G_ema at the
dryrun's minimal config (18x32, seq 4, channel_max 32 — the cheapest config
that keeps all lres blocks and both upsample kinds live).

The full trainer suite (test_train_steps.py) is slow-tier and takes >28 min
cold on a 1-core host; this test makes trainer regressions catchable inside a
review window (`pytest -m smoke`). Reference step cycle:
/root/reference/train_lres.py:222-228.
"""

import numpy as np

import jax
import jax.numpy as jnp

from long_video_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from long_video_gan_tpu.train.gan_lres import LowResVideoGAN


def test_lres_update_d_and_ema_one_step():
    # Same config as __graft_entry__._dryrun_multichip_body phase 1.
    batch, seq = 8, 4
    gan = LowResVideoGAN(
        seq_length=seq, height=18, width=32, total_batch=batch,
        G_random_temp_translate=True, temp_scale_augment=1.0,
        G_grad_accum=1, D_grad_accum=1,
        G_kwargs=dict(temporal_emb_dim=64, latent_w_dim=64, temporal_padding=2,
                      channel_max=32,
                      embedding_kwargs=dict(min_sampling_rate=10,
                                            max_sampling_rate=40,
                                            blur_widths=16)),
        D_kwargs=dict(channels_max=32, epilogue_kwargs=dict(channels=64)),
    )
    mesh = create_mesh()
    state = replicate(gan.init_state(jax.random.key(0)), mesh)
    real = shard_batch(
        jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, 3, seq, 18, 32)).astype(np.float32)), mesh)

    d_before = jax.tree.map(jnp.copy, state.D["params"])

    state, d_stats = gan.update_D(state, jax.random.key(2), real)
    state = gan.update_G_ema(state)

    assert int(state.step) == 1
    for k, v in d_stats.items():
        assert bool(jnp.isfinite(v).all()), f"D:{k} not finite"
    delta_d = max(float(jnp.abs(x - y).max()) for x, y in
                  zip(jax.tree.leaves(d_before), jax.tree.leaves(state.D["params"])))
    assert delta_d > 0
    # The D phase generates fakes, so G's magnitude EMAs moved (beta < 1).
    assert any(float(x) != 1.0 for x in jax.tree.leaves(state.G["ema"]))
    for leaf in jax.tree.leaves(state.G_ema["params"]):
        assert bool(jnp.isfinite(leaf).all())
