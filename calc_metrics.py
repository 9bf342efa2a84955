"""Metric computation CLI for trained checkpoints.

TPU-native equivalent of the reference's calc_metrics.py: evaluates the
combined lres->sres pipeline (or a single lres generator) against a dataset,
averaging over --num-runs with fresh seeds, writing JSON lines.

Detectors: download once (URLs in long_video_gan_tpu/metrics/detectors.py) and
point $LVG_DETECTOR_DIR at the directory, or pass --detector <path|stub:D>.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import click


@click.command()
@click.option("--metric", "-m", "metrics", type=str, multiple=True, required=True,
              help="Metrics to compute (e.g. fvd2048_128f, fid50k_full)")
@click.option("--sres", "sres_path", type=str, default=None, help="sres G_ema checkpoint")
@click.option("--lres", "lres_path", type=str, required=True, help="lres G_ema checkpoint")
@click.option("--dataset", "dataset_dir", type=str, required=True)
@click.option("--num-runs", type=int, default=1)
@click.option("--batch", "batch_size", type=int, default=16)
@click.option("--detector", type=str, default=None,
              help="Detector override: a torchscript path or stub:<dim> (tests)")
@click.option("--max-items", type=int, default=None,
              help="Cap real/generated feature counts (validation/smoke runs)")
@click.option("--output", type=str, default=None, help="JSONL output path")
@click.option("--replace-cache", is_flag=True, default=False,
              help="Recompute the dataset feature stats instead of reusing the "
                   "blake2b-keyed cache (reference calc_metrics.py:29)")
@click.option("--seed", type=int, default=0)
@click.option("--verbose", is_flag=True, default=False)
def main(metrics, sres_path, lres_path, dataset_dir, num_runs, batch_size, detector,
         max_items, output, replace_cache, seed, verbose):
    import jax

    if os.environ.get("LVG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LVG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    # A dead axon tunnel must yield a one-line diagnosis, not a silent hang.
    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(os.environ.get("LVG_INIT_TIMEOUT", "120")))

    from long_video_gan_tpu.io.checkpoint import load_generator
    from long_video_gan_tpu.metrics import metric_main

    lres_G, lres_vars, _ = load_generator(lres_path)

    kwargs = dict(num_runs=num_runs, batch_size=batch_size, seed=seed, verbose=verbose,
                  detector=detector, max_items_override=max_items,
                  replace_cache=replace_cache)
    if sres_path is not None:
        sres_G, sres_vars, _ = load_generator(sres_path)
        kwargs.update(
            G=(sres_G, sres_vars), lr_G=(lres_G, lres_vars),
            dataset_kwargs=dict(dataset_dir=dataset_dir, seq_length=1,
                                height=sres_G.hr_height, width=sres_G.hr_width),
            cond_dataset_kwargs=dict(dataset_dir=dataset_dir, seq_length=1,
                                     height=sres_G.lr_height, width=sres_G.lr_width))
    else:
        kwargs.update(
            G=(lres_G, lres_vars),
            dataset_kwargs=dict(dataset_dir=dataset_dir, seq_length=1,
                                height=lres_G.out_height, width=lres_G.out_width))

    for metric in metrics:
        result = metric_main.calc_metric(metric=metric, **kwargs)
        line = json.dumps(dict(result, lres=lres_path, sres=sres_path))
        print(line)
        if output:
            Path(output).parent.mkdir(parents=True, exist_ok=True)
            with open(output, "at") as fp:
                fp.write(line + "\n")


if __name__ == "__main__":
    main()
