"""Worker for tests/test_multihost.py: one process of a 2-process CPU world.

Runs the real multi-host path end-to-end: env-gated jax.distributed.initialize
(parallel/multihost.py), per-host batch shards assembled into a global array
(parallel/mesh.shard_batch), a cross-process collective reduction over that
array, and one full generator train step. Prints a checksum line both
processes must agree on bit-exactly.

Kept deliberately light on compiles: the gloo KV rendezvous inside the first
collective has a hard 30 s deadline, and two multi-minute XLA compiles on this
1-core host can skew past it. The G update (replicated params, scan
grad-accum, EMA) plus the explicit global-mean reduction covers every
multi-host mechanism the train CLIs rely on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; pin the CPU backend
# explicitly BEFORE distributed init touches the backend.
jax.config.update("jax_platforms", "cpu")

from long_video_gan_tpu.parallel.multihost import (
    is_main_process, local_batch_size, maybe_initialize_distributed)

assert maybe_initialize_distributed(), "LVG_COORDINATOR must be set"

import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.process_count() == 2, jax.process_count()
assert (jax.process_index() == 0) == is_main_process()

from long_video_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from long_video_gan_tpu.train.gan_lres import LowResVideoGAN

mesh = create_mesh()

# --- Global-array assembly + cross-process collective ----------------------
# Deterministic but host-DISTINCT local rows; the global mean is only
# reproducible if make_array_from_process_local_data and the GSPMD-inserted
# cross-process reduction both work.
TOTAL_BATCH = 4
local_bs = local_batch_size(TOTAL_BATCH)
rows = np.arange(TOTAL_BATCH, dtype=np.float32).reshape(-1, 1, 1, 1, 1)
full = np.broadcast_to(rows, (TOTAL_BATCH, 3, 8, 8, 16))
local = full[jax.process_index() * local_bs:(jax.process_index() + 1) * local_bs]
batch = shard_batch(np.ascontiguousarray(local), mesh)
assert batch.shape[0] == TOTAL_BATCH  # global shape

gmean = float(jax.device_get(jax.jit(jnp.mean)(batch)))
gsq = float(jax.device_get(jax.jit(lambda b: jnp.sum(b * b))(batch)))
expect_mean = float(full.mean())
assert abs(gmean - expect_mean) < 1e-6, (gmean, expect_mean)

# --- One full generator train step over the global mesh --------------------
gan = LowResVideoGAN(
    seq_length=8, height=8, width=16, total_batch=TOTAL_BATCH,
    G_grad_accum=2, D_grad_accum=1,
    G_kwargs=dict(temporal_emb_dim=32, latent_w_dim=32, temporal_padding=2,
                  channel_max=16,
                  embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40,
                                        blur_widths=8)),
    D_kwargs=dict(channels_max=16, epilogue_kwargs=dict(channels=32)),
)
state = replicate(gan.init_state(jax.random.key(0)), mesh)
state, g_stats = gan.update_G(state, jax.random.key(1))
state = gan.update_G_ema(state)

g_loss = float(np.mean(jax.device_get(g_stats["loss/G_loss"])))
assert np.isfinite(g_loss)
print(f"CHECKSUM {jax.process_index()} {gmean:.9e} {gsq:.9e} {g_loss:.9e}",
      flush=True)
