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
import collections
import glob
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _category(name: str) -> str:
    n = name.lower()
    if "flr" in n or "packed" in n or "custom-call" in n and "mosaic" in n:
        return "pallas filtered_lrelu"
    if n.startswith("%convolution") or "conv" in n.split(".")[0]:
        return "conv"
    if n.startswith("%dot") or "dot" in n.split(".")[0]:
        return "dot (resample/mapping)"
    if "fusion" in n:
        return "fusion (elementwise/reduce)"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "relayout"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "pad" in n or "gather" in n:
        return "slice/concat/pad/gather"
    return "other"


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

    tmp = tempfile.mkdtemp(prefix="lvg_trace_")
    with jax.profiler.trace(tmp):
        float(synth(variables, lr_video, z))

    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane written under {tmp}"
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as fp:
        xs.ParseFromString(fp.read())

    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "Axon" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                rows.append((ev_meta.get(ev.metadata_id, "?"),
                             ev.duration_ps / 1e12))
    assert rows, "no XLA Ops line found in the device plane"

    per_op = collections.Counter()
    per_cat = collections.Counter()
    for name, dur in rows:
        per_op[name] += dur
        per_cat[_category(name)] += dur
    total = sum(per_op.values())
    frames = segment * chain

    print(f"\ndevice time for {chain} chained segments = {total*1e3:.1f} ms "
          f"({frames/total:.1f} frames/s device-side)\n")
    print(f"{'category':<32}{'ms':>9}{'%':>7}")
    for cat, dur in per_cat.most_common():
        print(f"{cat:<32}{dur*1e3:>9.2f}{100*dur/total:>6.1f}%")
    print(f"\ntop {args.top} ops by total self time:")
    print(f"{'op':<72}{'ms':>9}{'%':>7}")
    for name, dur in per_op.most_common(args.top):
        print(f"{name[:71]:<72}{dur*1e3:>9.2f}{100*dur/total:>6.1f}%")


if __name__ == "__main__":
    main()
