"""Training-throughput benchmark on real TPU hardware.

Measures sec/step and peak HBM for the reference's two headline training
configs (BASELINE.md), single chip, synthetic data (the data path is benched
separately in tests/test_native_jpeg.py):

  * lres: total batch 64 via grad-accum, seq 128 @ 36x64
    (reference train_lres.py:259-279 — 8xA100 used batch 64 / accum 2)
  * sres: total batch 32, seq 4 + 2*4 context @ 36x64 -> 144x256
    (reference train_sres.py:293-317)

One "step" = the reference step cycle: update_G + update_D + update_G_ema
with update_r1 every r1_interval=16 steps amortized in (reference
train_lres.py:222-228). Prints one JSON line per config.

Usage: python bench_train.py [--config lres|sres|both] [--accum N]
"""

from __future__ import annotations

import argparse
import json
import time


def _peak_hbm_gb():
    """Peak HBM in GiB, or None when the backend hides memory stats (axon)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return None


def bench_lres(accum: int, steps: int, remat: bool = False,
               block_remat: bool = False, fp16_layers: int = 0,
               accum_unroll: int = 1, d_fp16_res: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from long_video_gan_tpu.train.gan_lres import LowResVideoGAN

    total_batch = 64
    seq = 128
    gan = LowResVideoGAN(
        seq_length=seq, height=36, width=64, total_batch=total_batch,
        G_grad_accum=accum, D_grad_accum=accum,
        G_random_temp_translate=True, temp_scale_augment=1.0,
        r1_gamma=1.0, remat=remat, accum_unroll=accum_unroll,
        G_kwargs=dict(num_fp16_layers=fp16_layers, temporal_padding=8,
                      temporal_emb_dim=1024, block_remat=block_remat),
        D_kwargs=dict(num_fp16_res=d_fp16_res),
    )
    state = gan.init_state(jax.random.key(0))
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.standard_normal((total_batch, 3, seq, 36, 64)).astype(np.float32))

    def cycle(state, key, with_r1):
        kg, kd, kr = jax.random.split(key, 3)
        state, g_stats = gan.update_G(state, kg)
        state, d_stats = gan.update_D(state, kd, real)
        if with_r1:
            state, _ = gan.update_r1(state, kr, real, gain=16.0)
        state = gan.update_G_ema(state)
        return state, g_stats, d_stats

    # Warmup: compile all four phases AND run them twice with a forced scalar
    # readback — on axon, block_until_ready returns early, and the first
    # execution of each program pays a one-time device-side setup cost that
    # must not leak into the timed region (measured r3: it inflated sec/step
    # ~6x at steps=8).
    for k in (1, 11):
        state, *_ = cycle(state, jax.random.key(k), with_r1=True)
        float(jax.device_get(state.step))

    r1_interval = 16
    per_step = []
    for i in range(steps):
        start = time.perf_counter()
        state, g_stats, d_stats = cycle(state, jax.random.fold_in(jax.random.key(2), i),
                                        with_r1=(i % r1_interval == 0))
        # Force completion (axon: scalar readback is the reliable sync).
        float(jax.device_get(state.step))
        per_step.append(time.perf_counter() - start)
    float(np.sum(jax.device_get(g_stats["loss/G_loss"])))

    return {
        "metric": "lres_train_sec_per_step_batch64_seq128",
        "value": round(float(np.median(per_step)), 4),
        "unit": "sec/step",
        "mean": round(float(np.mean(per_step)), 4),
        "per_step": [round(t, 2) for t in per_step],
        "grad_accum": accum,
        "remat": remat,
        "block_remat": block_remat,
        "accum_unroll": accum_unroll,
        "fp16_layers": fp16_layers,
        "d_fp16_res": d_fp16_res,
        "peak_hbm_gb": _peak_hbm_gb(),
    }


def bench_sres(accum: int, steps: int, remat: bool = False,
               block_remat: bool = False, accum_unroll: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from long_video_gan_tpu.train.gan_sres import SuperResVideoGAN

    total_batch = 32
    seq, ctx = 4, 4
    gan = SuperResVideoGAN(
        seq_length=seq, temporal_context=ctx,
        lr_height=36, lr_width=64, hr_height=144, hr_width=256,
        total_batch=total_batch, G_grad_accum=accum, D_grad_accum=accum,
        r1_gamma=1.0, remat=remat, accum_unroll=accum_unroll,
        G_kwargs=dict(num_fp16_res=4, resample_impl="auto",
                      block_remat=block_remat),
        D_kwargs=dict(num_fp16_res=4),
    )
    state = gan.init_state(jax.random.key(0))
    rng = np.random.default_rng(0)
    lr_ctx = jnp.asarray(rng.standard_normal(
        (total_batch, 3, seq + 2 * ctx, 36, 64)).astype(np.float32))
    lr = gan.crop_to_seq_length(lr_ctx)
    hr = jnp.asarray(rng.standard_normal(
        (total_batch, 3, seq, 144, 256)).astype(np.float32))

    def cycle(state, key, i):
        kg, kd, kr = jax.random.split(key, 3)
        state, g_stats = gan.update_G(state, kg, lr_ctx)
        state, d_stats = gan.update_D(state, kd, lr_ctx, lr_ctx, hr)
        if i % 16 == 0:
            state, _ = gan.update_r1(state, kr, lr, hr, gain=16.0)
        if i % 4 == 0:
            state, _ = gan.update_ada(state, gain=4.0)
        state = gan.update_G_ema(state)
        return state, g_stats

    # Two forced-sync warmup cycles (see bench_lres warmup comment).
    for k in (1, 11):
        state, _ = cycle(state, jax.random.key(k), 0)
        float(jax.device_get(state.step))

    per_step = []
    for i in range(steps):
        start = time.perf_counter()
        state, g_stats = cycle(state, jax.random.fold_in(jax.random.key(2), i), i)
        float(jax.device_get(state.step))
        per_step.append(time.perf_counter() - start)
    float(np.sum(jax.device_get(g_stats["loss/G_loss"])))

    return {
        "metric": "sres_train_sec_per_step_batch32_144x256",
        "value": round(float(np.median(per_step)), 4),
        "unit": "sec/step",
        "mean": round(float(np.mean(per_step)), 4),
        "per_step": [round(t, 2) for t in per_step],
        "grad_accum": accum,
        "remat": remat,
        "block_remat": block_remat,
        "accum_unroll": accum_unroll,
        "peak_hbm_gb": _peak_hbm_gb(),
    }


def main():
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["lres", "sres", "both"], default="both")
    # Defaults are the round-5 measured-best single-chip configs (BASELINE.md
    # round-5 training table): lres micro-batch 8 needs fp16-layers >= 4 to
    # fit (fp16 0 OOMs by 1.25 GB); sres micro-batch 8 / rolled scan is best.
    ap.add_argument("--lres-accum", type=int, default=8)
    ap.add_argument("--sres-accum", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--unroll-accum", type=int, default=1,
                    help="unroll factor for the grad-accumulation scans "
                         "(1 = rolled; full unroll OOMs at the sres config)")
    ap.add_argument("--block-remat", action="store_true",
                    help="per-block rematerialization inside the generators")
    ap.add_argument("--lres-fp16-layers", type=int, default=6,
                    help="run the last N lres generator layers in bf16 "
                         "(reference opt-in, model/generator_lres.py:694-696; "
                         "halves the late-layer block-input residuals that "
                         "cap the micro-batch)")
    ap.add_argument("--lres-d-fp16-res", type=int, default=2,
                    help="run the first N lres discriminator blocks in bf16 "
                         "(reference opt-in per-block fp16 ladder, "
                         "model/discriminator_lres.py:432-445). The lres step "
                         "is D-dominated and the first two blocks carry the "
                         "FLOPs: 2 is the measured-best (6.13 -> 5.13 "
                         "sec/step; 4 is a no-op over 2 — BASELINE.md r5)")
    args = ap.parse_args()

    # A dead axon tunnel must yield a one-line diagnosis, not a silent hang.
    # (After argparse, so `--help` never touches the single-client tunnel.)
    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(os.environ.get("LVG_INIT_TIMEOUT", "120")))

    if args.config in ("lres", "both"):
        print(json.dumps(bench_lres(args.lres_accum, args.steps, args.remat,
                                    args.block_remat, args.lres_fp16_layers,
                                    args.unroll_accum, args.lres_d_fp16_res)),
              flush=True)
    if args.config in ("sres", "both"):
        print(json.dumps(bench_sres(args.sres_accum, args.steps, args.remat,
                                    args.block_remat, args.unroll_accum)), flush=True)


if __name__ == "__main__":
    main()
