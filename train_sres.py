"""Stage-2 (super-resolution) training CLI.

TPU-native equivalent of the reference's train_sres.py: batch 32, 275k steps
of 4(+2*4 context)-frame paired 36x64 / 144x256 clips, ADA every 4 steps, R1
every 16, full-strength blit/geometric/color ADA config — over a jax
data-parallel mesh. Note the reference feeds the same lr batch as both the
fake-conditioning and real-lr inputs of update_D (train_sres.py:248-251).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import click
import numpy as np


def build_config(dataset_dir, total_batch, grad_accum, r1_gamma, metrics, preset):
    from long_video_gan_tpu.utils.misc import EasyDict

    c = EasyDict(
        dataset_dir=dataset_dir,
        seq_length=4, temporal_context=4,
        lr_height=36, lr_width=64, hr_height=144, hr_width=256,
        x_flip=True,
        total_steps=275_000, steps_per_tick=500,
        ticks_per_G_ema_ckpt=10, ticks_per_train_ckpt=100,
        result_seq_length=256, r1_interval=16, ada_interval=4,
        total_batch=total_batch, metrics=list(metrics),
    )
    c.loader_kwargs = EasyDict(num_workers=8, prefetch=4)
    c.gan_kwargs = EasyDict(
        D_lrate=0.003, D_beta2=0.99, lr_cond_prob=0.1, r1_gamma=r1_gamma,
        in_augment_p=0.5, in_augment_strength=8,
        G_grad_accum=grad_accum, D_grad_accum=grad_accum,
        G_kwargs=EasyDict(num_fp16_res=4, fourfeats=False, resample_impl="auto"),
        D_kwargs=EasyDict(num_fp16_res=4),
        augment_kwargs=EasyDict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                                aniso=1, xfrac=1, brightness=1, contrast=1,
                                lumaflip=1, hue=1, saturation=1),
    )
    if c.r1_interval > 0:
        mb_ratio = c.r1_interval / (c.r1_interval + 1)
        c.gan_kwargs.D_lrate *= mb_ratio
        c.gan_kwargs.D_beta2 **= mb_ratio

    if preset == "tiny":
        c.update(seq_length=2, temporal_context=2, lr_height=8, lr_width=16,
                 hr_height=32, hr_width=64, total_steps=4, steps_per_tick=2,
                 ticks_per_G_ema_ckpt=1, ticks_per_train_ckpt=2,
                 result_seq_length=8, r1_interval=2, ada_interval=2)
        c.gan_kwargs.G_kwargs.update(latent_z_dim=32, latent_w_dim=32, margin_size=4,
                                     num_fp16_res=0, channel_base=1024, channel_max=32,
                                     num_layers=6)
        c.gan_kwargs.D_kwargs.update(channels_base=512, channels_max=32, num_fp16_res=0)
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
        jax.config.update("jax_platforms", os.environ["LVG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # A dead axon tunnel must yield a one-line diagnosis, not a silent hang.
    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(os.environ.get("LVG_INIT_TIMEOUT", "120")))

    from long_video_gan_tpu.data.dataset import VideoDatasetTwoRes
    from long_video_gan_tpu.data.loader import get_infinite_data_iter
    from long_video_gan_tpu.io.checkpoint import load_checkpoint, save_checkpoint, save_generator
    from long_video_gan_tpu.models.generator_sres import sample_video_segments
    from long_video_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from long_video_gan_tpu.train.gan_sres import SuperResVideoGAN
    from long_video_gan_tpu.train.stats import Collector
    from long_video_gan_tpu.utils.video import write_video_grid

    start_time = time.time()
    mesh = create_mesh()
    ckpt_dir = Path(run_dir, "checkpoints")
    samples_dir = Path(run_dir, "samples")
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    samples_dir.mkdir(parents=True, exist_ok=True)

    context_len = c.seq_length + 2 * c.temporal_context
    print(f"Loading paired video dataset from {c.dataset_dir} ...")
    dataset = VideoDatasetTwoRes(c.dataset_dir, context_len, c.lr_height, c.lr_width,
                                 c.hr_height, c.hr_width, x_flip=c.x_flip)
    data_iter = get_infinite_data_iter(
        dataset, batch_size=local_batch_size(c.total_batch), seed=seed,
        shard_id=jax.process_index(), num_shards=jax.process_count(), **c.loader_kwargs)

    result_dataset = VideoDatasetTwoRes(
        c.dataset_dir, c.result_seq_length + 2 * c.temporal_context,
        c.lr_height, c.lr_width, c.hr_height, c.hr_width, x_flip=c.x_flip)
    sample0 = result_dataset.sample(0, np.random.default_rng(seed))
    result_lr = sample0["lr_video"][None]
    if is_main_process():
        write_video_grid(result_lr[:, :, c.temporal_context:-c.temporal_context or None],
                         samples_dir / "real-lr.mp4")
        write_video_grid(sample0["hr_video"][None][:, :, c.temporal_context:-c.temporal_context or None],
                         samples_dir / "real-hr.mp4")

    print("Constructing super res GAN model ...")
    gan = SuperResVideoGAN(
        seq_length=c.seq_length, temporal_context=c.temporal_context,
        lr_height=c.lr_height, lr_width=c.lr_width,
        hr_height=c.hr_height, hr_width=c.hr_width,
        total_batch=c.total_batch, **c.gan_kwargs)

    base_key = jax.random.key(seed)
    state = gan.init_state(base_key)
    start_step = 0
    if resume:
        state, meta = load_checkpoint(resume, target=state)
        start_step = int(meta.get("step", 0))
        print(f"Resumed from {resume} at step {start_step}")
    state = replicate(state, mesh)

    G_config = dict(kind="generator_sres",
                    kwargs=dict(hr_height=c.hr_height, hr_width=c.hr_width,
                                lr_height=c.lr_height, lr_width=c.lr_width,
                                temporal_context=c.temporal_context,
                                **c.gan_kwargs.G_kwargs))

    collector = Collector()
    stats_fp = open(Path(run_dir, "stats.jsonl"), "at")
    tick_start = time.time()
    sres_apply = None

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
                          f"D_loss {record.get('loss/D_loss', float('nan')):.3f} "
                          f"ada_p {record.get('progress/augment_p', float('nan')):.4f}")
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

                if sres_apply is None:
                    sres_apply = jax.jit(lambda v, w, z: gan.G.apply(v, w, z=z))
                z = jax.random.normal(jax.random.key(seed + step), (1, gan.G.latent_z_dim))
                segments = sample_video_segments(
                    sres_apply, host_state.G_ema, jnp.asarray(result_lr),
                    segment_length=8, temporal_context=c.temporal_context, z=z)
                write_video_grid((np.asarray(s) for s in segments),
                                 samples_dir / f"fake-{step:08d}-hr.mp4")

                if c.metrics:
                    from long_video_gan_tpu.metrics import metric_main

                    for metric in c.metrics:
                        result = metric_main.calc_metric(
                            metric=metric, G=(gan.G, host_state.G_ema),
                            detector=c.get("metric_detector"),
                            max_items_override=c.get("metric_items"),
                            dataset_kwargs=dict(dataset_dir=c.dataset_dir, seq_length=1,
                                                height=c.hr_height, width=c.hr_width),
                            cond_dataset_kwargs=dict(dataset_dir=c.dataset_dir, seq_length=1,
                                                     height=c.lr_height, width=c.lr_width))
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

        lr_video = shard_batch(next(data_iter)["lr_video"], mesh)
        state, stats = gan.update_G(state, kg, lr_video)
        collector.report(stats)

        sample = next(data_iter)
        lr_video = shard_batch(sample["lr_video"], mesh)
        hr_video = shard_batch(
            gan.crop_to_seq_length(np.asarray(sample["hr_video"])), mesh)
        # Same lr batch conditions both the fake and real branches
        # (reference train_sres.py:248-251).
        state, stats = gan.update_D(state, kd, lr_video, lr_video, hr_video)
        collector.report(stats)

        if c.r1_interval > 0 and step % c.r1_interval == 0:
            sample = next(data_iter)
            lr_crop = shard_batch(gan.crop_to_seq_length(np.asarray(sample["lr_video"])), mesh)
            hr_crop = shard_batch(gan.crop_to_seq_length(np.asarray(sample["hr_video"])), mesh)
            state, stats = gan.update_r1(state, kr, lr_crop, hr_crop,
                                         gain=float(c.r1_interval))
            collector.report(stats)

        if c.ada_interval > 0 and step % c.ada_interval == 0:
            state, stats = gan.update_ada(state, gain=float(c.ada_interval))
            collector.report(stats)

        state = gan.update_G_ema(state)

    data_iter.close()
    stats_fp.close()


@click.command()
@click.option("--outdir", type=str, default="runs/sres")
@click.option("--dataset", "dataset_dir", type=str, required=True)
@click.option("--batch", "total_batch", type=int, default=32)
@click.option("--grad-accum", type=int, default=1)
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
@click.option("--resume", type=str, default=None)
@click.option("--total-steps", type=int, default=None)
@click.option("--remat", is_flag=True, default=False,
              help="Rematerialize G/D forwards in backward (fits bigger micro-batches)")
@click.option("--block-remat", is_flag=True, default=False,
              help="Per-block rematerialization inside G. Measured 6.7x SLOWER "
                   "for sres on v5e (the fused kernel's VJP already recomputes; "
                   "see BASELINE.md) — useful only if a config OOMs otherwise")
@click.option("--matmul-precision", type=click.Choice(["default", "high", "highest"]),
              default="default", help="'highest' == reference's TF32-off f32 matmuls")
@click.option("--unroll-accum", type=int, default=1,
              help="Unroll factor for the grad-accumulation scans. >1 removes "
                   "the scan carry relayout copies (39.6% of update_G device "
                   "time at unroll 1) at the cost of compile time + peak HBM; "
                   "full unroll OOMs at the reference config. See BASELINE.md "
                   "round-5 training table for measured settings.")
@click.option("--wandb", "use_wandb", is_flag=True, default=False)
def main(outdir, dataset_dir, total_batch, grad_accum, r1_gamma, metrics,
         metric_detector, metric_items, preset, seed, resume, total_steps, remat, block_remat,
         matmul_precision, unroll_accum, use_wandb):
    """Train a super-resolution LongVideoGAN network.

    Example (full config, matching the reference 8-GPU recipe):

        python train_sres.py --dataset=datasets/horseback --batch=32 \\
            --grad-accum=1 --gamma=1.0 --metric=fvd2048_16f
    """
    c = build_config(dataset_dir, total_batch, grad_accum, r1_gamma, metrics, preset)
    if total_steps is not None:
        c.total_steps = total_steps
    c.gan_kwargs.remat = remat
    c.gan_kwargs.accum_unroll = unroll_accum
    c.gan_kwargs.G_kwargs.block_remat = block_remat
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

            wandb.init(dir=run_dir, name=Path(run_dir).name, project="long-video-gan-sres",
                       config=c)
    train(c, run_dir, seed, resume, use_wandb and is_main_process())


if __name__ == "__main__":
    main()
