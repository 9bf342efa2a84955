"""Stage-1 (low-resolution) training CLI.

TPU-native equivalent of the reference's train_lres.py: same config surface
(batch 64, grad-accum 2, gamma, metrics; 100k steps of 128-frame 36x64 clips,
ticks of 500 steps, G_ema checkpoints every 10 ticks, train checkpoints every
100) over a jax data-parallel mesh instead of torchrun+NCCL. Adds a complete
--resume path (the reference's start_step is unwired, SURVEY section 5).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import click
import numpy as np


def build_config(dataset_dir, total_batch, grad_accum, r1_gamma, metrics, preset,
                 fp16_layers=0):
    from long_video_gan_tpu.utils.misc import EasyDict

    c = EasyDict(
        dataset_dir=dataset_dir,
        seq_length=128, height=36, width=64, x_flip=True,
        total_steps=100_000, steps_per_tick=500,
        ticks_per_G_ema_ckpt=10, ticks_per_train_ckpt=100,
        result_seq_length=256, r1_interval=16,
        total_batch=total_batch, metrics=list(metrics),
    )
    c.loader_kwargs = EasyDict(num_workers=8, prefetch=4)
    c.gan_kwargs = EasyDict(
        D_lrate=0.002, D_beta2=0.99, r1_gamma=r1_gamma,
        G_random_temp_translate=True, temp_scale_augment=1.0,
        G_grad_accum=grad_accum, D_grad_accum=grad_accum,
        G_kwargs=EasyDict(num_fp16_layers=fp16_layers, temporal_padding=8,
                          temporal_emb_dim=1024),
        D_kwargs=EasyDict(num_fp16_res=0),
    )
    if c.r1_interval > 0:
        # Lazy-regularization lr/beta correction (reference train_lres.py:306-309).
        mb_ratio = c.r1_interval / (c.r1_interval + 1)
        c.gan_kwargs.D_lrate *= mb_ratio
        c.gan_kwargs.D_beta2 **= mb_ratio

    if preset == "tiny":  # smoke-test scale
        c.update(seq_length=8, height=8, width=16, total_steps=4, steps_per_tick=2,
                 ticks_per_G_ema_ckpt=1, ticks_per_train_ckpt=2, result_seq_length=16,
                 r1_interval=2)
        c.gan_kwargs.G_kwargs.update(
            temporal_emb_dim=64, latent_w_dim=64, temporal_padding=2, channel_max=32,
            embedding_kwargs=EasyDict(min_sampling_rate=10, max_sampling_rate=40,
                                      blur_widths=16))
        c.gan_kwargs.D_kwargs.update(channels_max=32,
                                     epilogue_kwargs=EasyDict(channels=64))
    return c


def train(c, run_dir: str, seed: int, resume: str | None, use_wandb: bool):
    import faulthandler
    import os
    import signal

    faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> dumps all stacks

    import jax
    import jax.numpy as jnp

    from long_video_gan_tpu.parallel.multihost import (
        is_main_process, local_batch_size, maybe_initialize_distributed)

    # Multi-host SPMD (env-gated; no-op single host). Must precede backend init.
    # Launch recipe: parallel/multihost.py docstring.
    maybe_initialize_distributed()

    if os.environ.get("LVG_PLATFORM"):
        # The axon TPU plugin ignores JAX_PLATFORMS; honor our own env knob.
        jax.config.update("jax_platforms", os.environ["LVG_PLATFORM"])
    # Reference trains with TF32 disabled (full f32 matmuls, train_lres.py:266-268,76-77).
    # TPU default matmul precision is bf16-ish; "highest" restores f32-equivalent.
    jax.config.update("jax_default_matmul_precision", c.get("matmul_precision", "default"))
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # A dead axon tunnel must yield a one-line diagnosis, not a silent hang.
    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(os.environ.get("LVG_INIT_TIMEOUT", "120")))

    from long_video_gan_tpu.data.dataset import VideoDataset
    from long_video_gan_tpu.data.loader import get_infinite_data_iter
    from long_video_gan_tpu.io.checkpoint import load_checkpoint, save_checkpoint, save_generator
    from long_video_gan_tpu.models.generator_lres import sample_video_segments
    from long_video_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from long_video_gan_tpu.train.gan_lres import LowResVideoGAN
    from long_video_gan_tpu.train.stats import Collector
    from long_video_gan_tpu.utils.video import write_video_grid

    start_time = time.time()
    mesh = create_mesh()
    ckpt_dir = Path(run_dir, "checkpoints")
    samples_dir = Path(run_dir, "samples")
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    samples_dir.mkdir(parents=True, exist_ok=True)

    print(f"Loading video dataset from {c.dataset_dir} ...")
    dataset = VideoDataset(c.dataset_dir, c.seq_length, c.height, c.width, x_flip=c.x_flip)
    result_dataset = VideoDataset(c.dataset_dir, c.result_seq_length, c.height, c.width,
                                  x_flip=c.x_flip)
    data_iter = get_infinite_data_iter(
        dataset, batch_size=local_batch_size(c.total_batch), seed=seed,
        shard_id=jax.process_index(), num_shards=jax.process_count(), **c.loader_kwargs)

    # Save one real video for reference (reference train_lres.py:99-112).
    if is_main_process():
        real = result_dataset.sample(0, np.random.default_rng(seed))["video"]
        write_video_grid(real[None], samples_dir / "real-long.mp4")

    print("Constructing low res GAN model ...")
    gan = LowResVideoGAN(seq_length=c.seq_length, height=c.height, width=c.width,
                         total_batch=c.total_batch, **c.gan_kwargs)

    base_key = jax.random.key(seed)
    state = gan.init_state(base_key)
    start_step = 0
    if resume:
        tree, meta = load_checkpoint(resume, target=state)
        state = tree
        start_step = int(meta.get("step", jax.device_get(state.step)))
        print(f"Resumed from {resume} at step {start_step}")
    state = replicate(state, mesh)

    G_config = dict(kind="generator_lres",
                    kwargs=dict(out_height=c.height, out_width=c.width,
                                **c.gan_kwargs.G_kwargs))

    collector = Collector()
    stats_fp = open(Path(run_dir, "stats.jsonl"), "at")
    tick_start = time.time()
    sample_apply = None

    print(f"Training for steps {start_step:,} - {c.total_steps:,}\n")
    for step in range(start_step, c.total_steps + 1):
        if step % c.steps_per_tick == 0:
            tick = step // c.steps_per_tick
            if step > start_step:
                sec_per_step = (time.time() - tick_start) / c.steps_per_tick
                collector.update()
                from long_video_gan_tpu.utils.profiling import host_memory_gb, peak_device_memory_gb

                record = {name: v["mean"] for name, v in collector.as_dict().items()}
                record.update(step=step, tick=tick, sec_per_step=sec_per_step,
                              total_sec=time.time() - start_time, timestamp=time.time(),
                              cpu_mem_gb=host_memory_gb(),
                              peak_device_mem_gb=peak_device_memory_gb())
                if is_main_process():
                    stats_fp.write(json.dumps(record) + "\n")
                    stats_fp.flush()
                    print(f"step {step:<8d} tick {tick:<5d} sec/step {sec_per_step:<7.3f} "
                          f"G_loss {record.get('loss/G_loss', float('nan')):.3f} "
                          f"D_loss {record.get('loss/D_loss', float('nan')):.3f}")
                    if use_wandb:
                        import wandb

                        wandb.log(record, step=step)

            if tick % c.ticks_per_G_ema_ckpt == 0 and is_main_process():
                host_state = jax.device_get(state)
                save_generator(str(ckpt_dir / f"ckpt-{step:08d}-G-ema.lvg"),
                               host_state.G_ema, G_config)
                if tick % c.ticks_per_train_ckpt == 0:
                    save_checkpoint(str(ckpt_dir / f"ckpt-{step:08d}-train.lvg"),
                                    host_state, dict(step=step))

                # Sample a long video from G_ema.
                if sample_apply is None:
                    sample_apply = jax.jit(
                        lambda v, n, t, rng: gan.G.apply(v, n, t, rngs={"noise": rng}),
                        static_argnums=(1, 2))
                segments = sample_video_segments(
                    lambda v, n, t, rng: sample_apply(v, n, t, rng),
                    host_state.G_ema, 1, c.result_seq_length,
                    rng=jax.random.key(seed + step))
                write_video_grid((np.asarray(s) for s in segments),
                                 samples_dir / f"fake-{step:08d}.mp4")

                if c.metrics:
                    from long_video_gan_tpu.metrics import metric_main

                    for metric in c.metrics:
                        result = metric_main.calc_metric(
                            metric=metric, G=(gan.G, host_state.G_ema),
                            detector=c.get("metric_detector"),
                            max_items_override=c.get("metric_items"),
                            dataset_kwargs=dict(dataset_dir=c.dataset_dir, seq_length=1,
                                                height=c.height, width=c.width))
                        line = json.dumps(dict(result, step=step))
                        print(line)
                        with open(Path(run_dir, f"metric-{metric}.jsonl"), "at") as fp:
                            fp.write(line + "\n")
            tick_start = time.time()

        if step == c.total_steps:
            print("Finished training!")
            break

        step_key = jax.random.fold_in(base_key, step)
        kg, kd, kr = jax.random.split(step_key, 3)

        state, stats = gan.update_G(state, kg)
        collector.report(stats)

        batch = shard_batch(next(data_iter)["video"], mesh)
        state, stats = gan.update_D(state, kd, batch)
        collector.report(stats)

        if c.r1_interval > 0 and step % c.r1_interval == 0:
            batch = shard_batch(next(data_iter)["video"], mesh)
            state, stats = gan.update_r1(state, kr, batch, gain=float(c.r1_interval))
            collector.report(stats)

        state = gan.update_G_ema(state)

    data_iter.close()
    stats_fp.close()


@click.command()
@click.option("--outdir", type=str, default="runs/lres", help="Output run directory root")
@click.option("--dataset", "dataset_dir", type=str, required=True)
@click.option("--batch", "total_batch", type=int, default=64,
              help="Total batch across devices and grad accumulation")
@click.option("--grad-accum", type=int, default=2)
@click.option("--gamma", "r1_gamma", type=float, default=1.0)
@click.option("--metric", "-m", "metrics", type=str, default=[], multiple=True)
@click.option("--metric-detector", type=str, default=None,
              help='Detector override for in-training metrics, e.g. "stub:64" '
                   "for detector-less smoke runs (default: the real detector "
                   "files, see metrics/detectors.py)")
@click.option("--metric-items", type=int, default=None,
              help="Cap real/generated feature counts of in-training metrics "
                   "(smoke runs; default: each metric's full protocol)")
@click.option("--preset", type=click.Choice(["full", "tiny"]), default="full")
@click.option("--seed", type=int, default=None)
@click.option("--resume", type=str, default=None, help="Train checkpoint to resume")
@click.option("--total-steps", type=int, default=None)
@click.option("--remat", is_flag=True, default=False,
              help="Rematerialize G/D forwards in backward (fits bigger micro-batches)")
@click.option("--block-remat", is_flag=True, default=False,
              help="Per-block rematerialization inside G. Lifts the fit "
                   "ceiling micro-batch 2->4 at f32, but --fp16-layers 6 "
                   "lifts it to micro-batch 8 WITHOUT recompute and runs "
                   "2.8x faster (6.13 vs 17.31 sec/step on v5e; "
                   "BASELINE.md round 5) — prefer --fp16-layers")
@click.option("--fp16-layers", type=int, default=0,
              help="Run the last N generator layers in bf16 (reference opt-in "
                   "model/generator_lres.py:694-696); halves late-layer "
                   "residual memory. Recommended on v5e: 6 with --grad-accum "
                   "8 (micro-batch 8 fits without remat, 6.13 sec/step "
                   "single-chip; micro-batch 8 OOMs at fp16-layers 0)")
@click.option("--d-fp16-res", type=int, default=0,
              help="Run the first N discriminator blocks in bf16 (reference "
                   "opt-in per-block fp16 ladder, model/discriminator_lres.py"
                   ":432-445; off in the released recipe). The lres step is "
                   "D-dominated on v5e (update_D 51%); recommended: 2, the "
                   "measured-best (6.13 -> 5.13 sec/step single-chip with "
                   "--fp16-layers 6; 4 buys nothing over 2 — BASELINE.md r5)")
@click.option("--matmul-precision", type=click.Choice(["default", "high", "highest"]),
              default="default", help="'highest' == reference's TF32-off f32 matmuls")
@click.option("--unroll-accum", type=int, default=1,
              help="Unroll factor for the grad-accumulation scans. >1 removes "
                   "the scan carry relayout copies at the cost of compile time "
                   "+ peak HBM. See BASELINE.md round-5 training table.")
@click.option("--wandb", "use_wandb", is_flag=True, default=False)
def main(outdir, dataset_dir, total_batch, grad_accum, r1_gamma, metrics,
         metric_detector, metric_items, preset, seed, resume, total_steps, remat, block_remat,
         fp16_layers, d_fp16_res, matmul_precision, unroll_accum, use_wandb):
    """Train a low-resolution LongVideoGAN network.

    Example (full config, matching the reference 8-GPU recipe):

        python train_lres.py --dataset=datasets/horseback --batch=64 \\
            --grad-accum=2 --gamma=1.0 --metric=fvd2048_128f
    """
    c = build_config(dataset_dir, total_batch, grad_accum, r1_gamma, metrics, preset,
                     fp16_layers)
    if total_steps is not None:
        c.total_steps = total_steps
    c.gan_kwargs.remat = remat
    c.gan_kwargs.accum_unroll = unroll_accum
    c.gan_kwargs.G_kwargs.block_remat = block_remat
    c.gan_kwargs.D_kwargs.num_fp16_res = d_fp16_res
    c.matmul_precision = matmul_precision
    c.metric_detector = metric_detector
    c.metric_items = metric_items

    from long_video_gan_tpu.parallel.multihost import (
        is_main_process, maybe_initialize_distributed)

    maybe_initialize_distributed()

    # Platform override + bounded backend init BEFORE the first JAX API call
    # (is_main_process below inits the backend; on a dead axon tunnel an
    # unbounded init blocks forever with no diagnosis).
    import os as _os

    import jax as _jax

    if _os.environ.get("LVG_PLATFORM"):
        _jax.config.update("jax_platforms", _os.environ["LVG_PLATFORM"])
    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(_os.environ.get("LVG_INIT_TIMEOUT", "120")))

    if seed is None:
        import jax

        # Multi-host: every process must use the same seed, so a random one
        # cannot be drawn independently per host.
        assert jax.process_count() == 1, "multi-host runs must pass --seed"
        seed = int(np.random.SeedSequence().entropy % (2**31))

    from long_video_gan_tpu.utils.video import get_next_run_dir

    desc = f"{Path(dataset_dir).name}-{total_batch}batch-{grad_accum}accum-{r1_gamma}gamma"
    run_dir = get_next_run_dir(outdir, desc=desc)
    if is_main_process():
        Path(run_dir).mkdir(parents=True, exist_ok=True)
        print(f"Run dir: {run_dir}  seed: {seed}")
        with open(Path(run_dir, "config.json"), "w") as fp:
            json.dump(dict(c, run_dir=run_dir, seed=seed), fp, indent=2, default=str)
        if use_wandb:
            import wandb

            wandb.init(dir=run_dir, name=Path(run_dir).name, project="long-video-gan-lres",
                       config=c)
    train(c, run_dir, seed, resume, use_wandb and is_main_process())


if __name__ == "__main__":
    main()
