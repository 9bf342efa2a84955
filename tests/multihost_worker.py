"""Worker for tests/test_multihost.py: one process of a 2-process CPU world.

Runs the real multi-host path end-to-end: env-gated jax.distributed.initialize
(parallel/multihost.py), per-host batch shard assembled into a global array
(parallel/mesh.shard_batch), and one G/D train-step cycle with GSPMD-inserted
cross-process collectives. Prints a checksum line both processes must agree on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from long_video_gan_tpu.parallel.multihost import (
    is_main_process, local_batch_size, maybe_initialize_distributed)

assert maybe_initialize_distributed(), "LVG_COORDINATOR must be set"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.process_count() == 2, jax.process_count()
assert (jax.process_index() == 0) == is_main_process()

from long_video_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from long_video_gan_tpu.train.gan_lres import LowResVideoGAN

TOTAL_BATCH = 4
gan = LowResVideoGAN(
    seq_length=8, height=8, width=16, total_batch=TOTAL_BATCH,
    G_grad_accum=1, D_grad_accum=1,
    G_kwargs=dict(temporal_emb_dim=32, latent_w_dim=32, temporal_padding=2,
                  channel_max=16,
                  embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40,
                                        blur_widths=8)),
    D_kwargs=dict(channels_max=16, epilogue_kwargs=dict(channels=32)),
)

mesh = create_mesh()
state = replicate(gan.init_state(jax.random.key(0)), mesh)

# Deterministic but host-DISTINCT local rows: the global batch is the
# concatenation, so the loss checksum is only reproducible if the global
# array assembly and the cross-process mean both work.
local_bs = local_batch_size(TOTAL_BATCH)
rows = np.arange(TOTAL_BATCH, dtype=np.float32).reshape(-1, 1, 1, 1, 1) / TOTAL_BATCH
local = np.broadcast_to(rows, (TOTAL_BATCH, 3, 8, 8, 16))
local = local[jax.process_index() * local_bs:(jax.process_index() + 1) * local_bs]
batch = shard_batch(np.ascontiguousarray(local), mesh)
assert batch.shape[0] == TOTAL_BATCH  # global shape

state, g_stats = gan.update_G(state, jax.random.key(1))
state, d_stats = gan.update_D(state, jax.random.key(2), batch)
state = gan.update_G_ema(state)

g_loss = float(jax.device_get(g_stats["loss/G_loss"]))
d_loss = float(jax.device_get(d_stats["loss/D_loss"]))
assert np.isfinite(g_loss) and np.isfinite(d_loss)
print(f"CHECKSUM {jax.process_index()} {g_loss:.9e} {d_loss:.9e}", flush=True)
