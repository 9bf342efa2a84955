"""Inspect the lane-packed kernel's per-layer plan for the production model.

Derives every filtered_lrelu call site of the full-size 144x256 generator by
abstractly tracing it (jax.eval_shape, no device compute), then prints the
packed kernel's chosen (k, g), lane occupancy, and executed banded FLOPs per
image for each bf16 layer — the knobs `LVG_PACKED_{VMEM_MB,K,G}` move and
BASELINE.md's budget tables cite. Runs host-side on any backend.

Usage: python scripts/packed_plan.py [--segment 16] [--vmem-mb 32]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segment", type=int, default=16)
    ap.add_argument("--vmem-mb", type=float, default=None,
                    help="override LVG_PACKED_VMEM_MB for the plan")
    args = ap.parse_args()
    if args.vmem_mb is not None:
        os.environ["LVG_PACKED_VMEM_MB"] = str(args.vmem_mb)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    import long_video_gan_tpu.models.generator_sres as gs
    from long_video_gan_tpu.ops.filtered_lrelu import _filter_size
    from long_video_gan_tpu.ops.pallas.filtered_lrelu_packed import (
        _packed_bwd_plan,
        _packed_fwd_plan,
    )
    from long_video_gan_tpu.ops.upfirdn2d import parse_padding

    calls = []
    real_flr = gs.filtered_lrelu

    def recording_flr(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                      gain=None, slope=0.2, clamp=None, impl="auto"):
        calls.append(dict(shape=tuple(x.shape), dtype=x.dtype, up=up, down=down,
                          padding=parse_padding(padding),
                          fu=None if fu is None else tuple(float(v) for v in fu),
                          fd=None if fd is None else tuple(float(v) for v in fd)))
        kwargs = {} if gain is None else dict(gain=gain)
        return real_flr(x, fu, fd, b, up=up, down=down, padding=padding,
                        slope=slope, clamp=clamp, impl="matrix", **kwargs)

    gs.filtered_lrelu = recording_flr
    try:
        segment, context = args.segment, 4
        G = gs.VideoGenerator(hr_height=144, hr_width=256, lr_height=36,
                              lr_width=64, temporal_context=context,
                              num_fp16_res=4)
        lr_shape = (1, 3, segment + 2 * context, 36, 64)

        def run():
            variables = G.init({"params": jax.random.key(0),
                                "noise": jax.random.key(1)},
                               jnp.zeros(lr_shape, jnp.float32))
            return G.apply(variables, jnp.zeros(lr_shape, jnp.float32),
                           z=jnp.zeros((1, G.latent_z_dim), jnp.float32))

        jax.eval_shape(run)
    finally:
        gs.filtered_lrelu = real_flr

    print(f"{len(calls)} filtered_lrelu call sites "
          f"(segment {segment}, budget "
          f"{os.environ.get('LVG_PACKED_VMEM_MB', '32 (default)')} MB)\n")
    hdr = (f"{'L':>2} {'imgs':>6} {'h x w':>10} {'up':>3}{'dn':>3} {'dtype':>9}"
           f" {'kf':>3}{'gf':>3} {'kb':>3}{'gb':>3} {'lane_occ':>9}"
           f" {'GF/img f':>9} {'GF/img b':>9}")
    print(hdr)
    for i, c in enumerate(calls):
        nimg = c["shape"][0] * c["shape"][1]
        h, w = c["shape"][2], c["shape"][3]
        fu_taps = c["fu"] if c["fu"] is not None else (1.0,)
        fd_taps = c["fd"] if c["fd"] is not None else (1.0,)
        trivial = (c["up"] == 1 and c["down"] == 1
                   and len(fu_taps) * len(fd_taps) == 1)
        if trivial:
            print(f"{i:>2} {nimg:>6} {h:>4}x{w:<5} {c['up']:>3}{c['down']:>3}"
                  f" {str(c['dtype']):>9}   (identity resample -> composed path)")
            continue
        itemsize = jnp.dtype(c["dtype"]).itemsize
        f = _packed_fwd_plan(h, w, c["up"], c["down"], c["padding"],
                             fu_taps, fd_taps, itemsize)
        bwd = _packed_bwd_plan(h, w, c["up"], c["down"], c["padding"],
                               fu_taps, fd_taps, itemsize)
        kwp = f["but"].shape[0]
        occ = f["k"] * w / kwp
        print(f"{i:>2} {nimg:>6} {h:>4}x{w:<5} {c['up']:>3}{c['down']:>3}"
              f" {str(c['dtype']):>9} {f['k']:>3}{f['g']:>3}"
              f" {bwd['k']:>3}{bwd['g']:>3} {occ:>8.2f}"
              f" {f['flops']/f['g']/f['k']/1e9:>9.2f}"
              f" {bwd['flops']/bwd['g']/bwd['k']/1e9:>9.2f}")


if __name__ == "__main__":
    main()
