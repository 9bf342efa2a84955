"""Op-level device-time breakdown of the production synthesis program.

Runs the same chained-synthesis program as bench.py under jax.profiler.trace
on real TPU hardware and prints the top HLO ops by self time, plus a grouped
summary (convs / filtered_lrelu kernels / resample matmuls / everything else)
— the drill-down companion to bench.py's single number and
scripts/bench_layers.py's per-layer budget.

Usage: python scripts/trace_ops.py [--impl auto] [--chain 4] [--top 30]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--segment", type=int, default=16)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from long_video_gan_tpu.models.generator_sres import VideoGenerator

    segment, context, batch = args.segment, 4, 1
    G = VideoGenerator(hr_height=144, hr_width=256, lr_height=36, lr_width=64,
                       temporal_context=context, num_fp16_res=4,
                       resample_impl=args.impl)
    lr_shape = (batch, 3, segment + 2 * context, 36, 64)
    shapes = jax.eval_shape(
        lambda: G.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                       jnp.zeros(lr_shape, jnp.float32)))
    rng = np.random.default_rng(0)

    def fill(path, s):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "ema" in name or "magnitude" in name:
            return np.ones(s.shape, s.dtype)
        if np.issubdtype(s.dtype, np.floating):
            return (rng.standard_normal(s.shape) * 0.1).astype(s.dtype)
        return np.zeros(s.shape, s.dtype)

    variables = jax.device_put(jax.tree_util.tree_map_with_path(fill, shapes))
    chain = args.chain

    @jax.jit
    def synth(variables, lr_video, z):
        def body(i, acc):
            zi = z + (i * 1e-8).astype(z.dtype)
            lri = lr_video * (1.0 + (i * 1e-8).astype(lr_video.dtype))
            return acc + jnp.sum(G.apply(variables, lri, z=zi))
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

    lr_video = jax.device_put(jnp.asarray(
        rng.standard_normal(lr_shape).astype(np.float32) * 0.2))
    z = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, G.latent_z_dim)).astype(np.float32)))

    for _ in range(2):  # compile + steady state
        float(synth(variables, lr_video, z))

    from long_video_gan_tpu.utils.profiling import print_op_summary, xplane_op_times

    tmp = tempfile.mkdtemp(prefix="lvg_trace_")
    with jax.profiler.trace(tmp):
        float(synth(variables, lr_video, z))

    rows = xplane_op_times(tmp)
    assert rows, "no XLA Ops line found in the device plane"
    total = sum(d for _, d in rows)
    frames = segment * chain
    print(f"\n{chain} chained segments: {frames / total:.1f} frames/s device-side")
    print_op_summary(rows, top=args.top)


if __name__ == "__main__":
    main()
