"""Streaming-synthesis prefetch sweep (sres sample_video_segments).

Measures end-to-end wall time of the production streaming path — unfold lr
windows, synthesize hr segments, consumer fetches each segment to host — at
prefetch depths 0/1/2/..., the knob generate.py exposes as --prefetch. The
win is dispatch-ahead overlap: the device synthesizes segment i+1 while the
host fetches/encodes segment i (each in-flight segment holds one extra hr
segment + synthesis workspace in HBM).

Usage: python scripts/bench_prefetch.py [--depths 0,1,2] [--segments 8]
Prints one JSON line per depth.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="0,1,2")
    ap.add_argument("--segments", type=int, default=8,
                    help="segments per timed run (video length = segments * 16)")
    ap.add_argument("--segment-length", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(os.environ.get("LVG_INIT_TIMEOUT", "120")))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from long_video_gan_tpu.models.generator_sres import (
        VideoGenerator, sample_video_segments)

    context = 4
    seg = args.segment_length
    n_seg = args.segments
    G = VideoGenerator(hr_height=144, hr_width=256, lr_height=36, lr_width=64,
                       temporal_context=context, num_fp16_res=4)
    lr_shape = (1, 3, n_seg * seg + 2 * context, 36, 64)
    shapes = jax.eval_shape(
        lambda: G.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                       jnp.zeros((1, 3, seg + 2 * context, 36, 64), jnp.float32)))
    rng = np.random.default_rng(0)

    def fill(path, s):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "ema" in name or "magnitude" in name:
            return np.ones(s.shape, s.dtype)
        if np.issubdtype(s.dtype, np.floating):
            return (rng.standard_normal(s.shape) * 0.1).astype(s.dtype)
        return np.zeros(s.shape, s.dtype)

    variables = jax.device_put(jax.tree_util.tree_map_with_path(fill, shapes))
    lr_video = jax.device_put(jnp.asarray(
        rng.standard_normal(lr_shape).astype(np.float32) * 0.2))
    z = jax.device_put(jnp.asarray(
        rng.standard_normal((1, G.latent_z_dim)).astype(np.float32)))
    apply_fn = jax.jit(lambda v, w, z: G.apply(v, w, z=z))

    def run(depth: int) -> float:
        """Wall seconds to stream + host-fetch every segment."""
        t0 = time.perf_counter()
        frames = 0
        for hr in sample_video_segments(apply_fn, variables, lr_video,
                                        segment_length=seg,
                                        temporal_context=context, z=z,
                                        prefetch=depth):
            frames += np.asarray(hr).shape[2]   # host fetch = the consumer work
        assert frames == n_seg * seg
        return time.perf_counter() - t0

    run(1)  # compile + warm
    for depth in (int(d) for d in args.depths.split(",")):
        times = [run(depth) for _ in range(args.iters)]
        best = min(times)
        print(json.dumps({
            "metric": "sres_streaming_frames_per_sec_256x144",
            "prefetch": depth,
            "value": round(n_seg * seg / best, 2),
            "unit": "frames/s",
            "wall_sec": [round(t, 3) for t in times],
        }), flush=True)


if __name__ == "__main__":
    main()
