"""Per-phase breakdown of the sres/lres training step on real TPU hardware.

bench_train.py reports one sec/step number for the whole reference step cycle
(G + D + EMA + amortized r1/ada). This script times each phase separately
(with the reference cadence amortization applied), reports each phase's
compiled FLOP count (XLA cost analysis), and the implied achieved TF/s — so
the slow phase and its roofline gap are identifiable (VERDICT r2 next-step 6;
reference per-tick timing: /root/reference/train_lres.py:129-148).

Optionally dumps a TensorBoard/Perfetto xplane trace of one full cycle
(--trace DIR) for op-level drill-down.

Usage: python scripts/profile_train.py [--config sres|lres] [--accum N]
       [--steps N] [--block-remat] [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["sres", "lres"], default="sres")
    ap.add_argument("--accum", type=int, default=None)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--block-remat", action="store_true")
    ap.add_argument("--unroll-accum", type=int, default=1)
    ap.add_argument("--lres-fp16-layers", type=int, default=0,
                    help="num_fp16_layers for the lres G (the measured-best "
                         "micro-batch-8 config needs >= 4 to fit on v5e; "
                         "BASELINE.md round 5)")
    ap.add_argument("--lres-d-fp16-res", type=int, default=0,
                    help="num_fp16_res for the lres D (per-block bf16 ladder; "
                         "the lres step is D-dominated — BASELINE.md round 5)")
    ap.add_argument("--trace", type=str, default=None,
                    help="dump an xplane trace to this dir and print the "
                         "grouped + top-op device-time summary")
    ap.add_argument("--trace-phase", type=str, default=None,
                    help="trace only this phase (e.g. update_G) instead of "
                         "the full cycle — the per-op drill-down for the "
                         "dominant phase")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.config == "sres":
        from long_video_gan_tpu.train.gan_sres import SuperResVideoGAN

        accum = args.accum or 4
        total_batch, seq, ctx = 32, 4, 4
        gan = SuperResVideoGAN(
            seq_length=seq, temporal_context=ctx,
            lr_height=36, lr_width=64, hr_height=144, hr_width=256,
            total_batch=total_batch, G_grad_accum=accum, D_grad_accum=accum,
            accum_unroll=args.unroll_accum,
            r1_gamma=1.0,
            G_kwargs=dict(num_fp16_res=4, resample_impl="auto",
                          block_remat=args.block_remat),
            D_kwargs=dict(num_fp16_res=4),
        )
        state = gan.init_state(jax.random.key(0))
        rng = np.random.default_rng(0)
        lr_ctx = jnp.asarray(rng.standard_normal(
            (total_batch, 3, seq + 2 * ctx, 36, 64)).astype(np.float32))
        lr = gan.crop_to_seq_length(lr_ctx)
        hr = jnp.asarray(rng.standard_normal(
            (total_batch, 3, seq, 144, 256)).astype(np.float32))
        key = jax.random.key(1)
        # (name, callable, per-step cadence weight)
        phases = [
            ("update_G", lambda s: gan.update_G(s, key, lr_ctx)[0], 1.0),
            ("update_D", lambda s: gan.update_D(s, key, lr_ctx, lr_ctx, hr)[0], 1.0),
            ("update_r1", lambda s: gan.update_r1(s, key, lr, hr, gain=16.0)[0], 1 / 16),
            ("update_ada", lambda s: gan.update_ada(s, gain=4.0)[0], 1 / 4),
            ("update_G_ema", gan.update_G_ema, 1.0),
        ]
    else:
        from long_video_gan_tpu.train.gan_lres import LowResVideoGAN

        accum = args.accum or 16
        total_batch, seq = 64, 128
        gan = LowResVideoGAN(
            seq_length=seq, height=36, width=64, total_batch=total_batch,
            G_grad_accum=accum, D_grad_accum=accum,
            accum_unroll=args.unroll_accum,
            G_random_temp_translate=True, temp_scale_augment=1.0,
            r1_gamma=1.0,
            G_kwargs=dict(num_fp16_layers=args.lres_fp16_layers, temporal_padding=8,
                          temporal_emb_dim=1024, block_remat=args.block_remat),
            D_kwargs=dict(num_fp16_res=args.lres_d_fp16_res),
        )
        state = gan.init_state(jax.random.key(0))
        rng = np.random.default_rng(0)
        real = jnp.asarray(rng.standard_normal(
            (total_batch, 3, seq, 36, 64)).astype(np.float32))
        key = jax.random.key(1)
        phases = [
            ("update_G", lambda s: gan.update_G(s, key)[0], 1.0),
            ("update_D", lambda s: gan.update_D(s, key, real)[0], 1.0),
            ("update_r1", lambda s: gan.update_r1(s, key, real, gain=16.0)[0], 1 / 16),
            ("update_G_ema", gan.update_G_ema, 1.0),
        ]

    # Warmup/compile each phase, then time it with forced scalar readback
    # (axon: block_until_ready is unreliable; a device->host read is the
    # sync). The phase jits donate the state argument, so the state must be
    # threaded through every call.
    results = []
    step_total = 0.0
    for name, fn, weight in phases:
        state = fn(state)
        float(jax.device_get(state.step))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state = fn(state)
            float(jax.device_get(state.step))
        dt = (time.perf_counter() - t0) / args.steps
        results.append({"phase": name, "sec": round(dt, 3),
                        "weight": weight,
                        "amortized_sec": round(dt * weight, 3)})
        step_total += dt * weight

    for r in results:
        r["pct_of_step"] = round(100 * r["amortized_sec"] / step_total, 1)
        print(json.dumps(r), flush=True)
    print(json.dumps({"config": args.config, "grad_accum": accum,
                      "block_remat": args.block_remat,
                      "accum_unroll": args.unroll_accum,
                      "amortized_sec_per_step": round(step_total, 3)}),
          flush=True)

    if args.trace:
        from long_video_gan_tpu.utils.profiling import (
            print_op_summary, trace, xplane_op_times)

        traced = [(n, f) for n, f, _ in phases
                  if args.trace_phase in (None, n)]
        assert traced, f"no phase named {args.trace_phase!r}"
        with trace(args.trace):
            for name, fn in traced:
                state = fn(state)
                float(jax.device_get(state.step))
        print(json.dumps({"trace_dir": args.trace,
                          "phases": [n for n, _ in traced]}), flush=True)
        print_op_summary(xplane_op_times(args.trace), top=args.top)


if __name__ == "__main__":
    main()
