"""long_video_gan_tpu — a TPU-native JAX framework with the capabilities of
NVlabs/long-video-gan (NeurIPS 2022, "Generating Long Videos of Dynamic Scenes").

This is a from-scratch rebuild, not a port: the reference's on-the-fly CUDA
extensions (upfirdn2d / bias_act / filtered_lrelu) are replaced by XLA-fused and
Pallas kernels over NCTHW tensors, torch DDP data-parallelism becomes a single
pjit-compiled SPMD step over a `jax.sharding.Mesh`, and checkpoints are explicit
array pytrees (plus a one-way converter from the reference's pickles).

Layout (mirrors SURVEY.md section 2's component inventory):
  ops/       resampling + activation primitives (reference: torch_utils/ops/*)
  models/    lres & sres generators/discriminators, ADA & DiffAugment
  train/     GAN train states, losses, pjit train steps, stats bus
  parallel/  mesh construction, sharding helpers, temporal (sequence) sharding
  data/      ZIP-shard video datasets + host prefetch loader + dataset tools
  metrics/   FVD / FID / KID / IS metric suite + feature statistics
  io/        array checkpoints + torch-pickle converter
  utils/     misc helpers (shape asserts, video writing, run dirs)
"""

__version__ = "0.1.0"
