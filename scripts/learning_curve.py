"""Metric curve over a training run's G_ema checkpoints, computed post hoc.

The reference only records quality metrics live, inside the training loop
(/root/reference/train_lres.py:188-206) — if a run was trained without
`--metric`, the curve is lost. This tool recovers it: point it at a run
directory and it evaluates every saved `ckpt-*-G-ema.lvg` against the
dataset with the same FVD protocol the in-training path uses
(`metric_main._compute_fvd`), printing a step -> FVD table and appending
one JSON line per checkpoint to `<run_dir>/metric-curve.jsonl`.

Works in detector-less environments with `--detector stub:<dim>` (the
random-projection stand-in from metrics/detectors.py — still a valid
distribution distance, useful for "is training learning?" smoke checks);
pass `--detector i3d` with LVG_DETECTOR_DIR set for the real protocol.

Single-stage (lres-only) by default; pass `--sres <G_ema ckpt>` to evaluate
the two-stage pipeline (then `--height/--width` should be the hr dataset
resolution, reference calc_metrics.py:69-78).
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@click.command()
@click.option("--run-dir", type=str, required=True,
              help="Training run dir (contains checkpoints/ and config.json)")
@click.option("--dataset", "dataset_dir", type=str, default=None,
              help="Dataset root (default: dataset_dir from the run's config.json)")
@click.option("--height", type=int, default=None, help="Real-stats resolution "
              "(default: from config.json)")
@click.option("--width", type=int, default=None)
@click.option("--frames", "num_frames", type=int, default=16,
              help="Detector clip length (16 = fvd2048_16f protocol)")
@click.option("--items", type=int, default=128,
              help="Real/generated feature count (2048 = reference protocol)")
@click.option("--detector", type=str, default="stub:64",
              help='Detector spec: "i3d" (needs LVG_DETECTOR_DIR) or "stub:<dim>"')
@click.option("--every", type=int, default=1, help="Evaluate every Nth checkpoint")
@click.option("--sres", "sres_path", type=str, default=None,
              help="sres G_ema checkpoint for two-stage evaluation")
@click.option("--seed", type=int, default=0)
def main(run_dir, dataset_dir, height, width, num_frames, items, detector,
         every, sres_path, seed):
    import jax

    if os.environ.get("LVG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LVG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(os.environ.get("LVG_INIT_TIMEOUT", "120")))

    from long_video_gan_tpu.io.checkpoint import load_generator
    from long_video_gan_tpu.metrics.metric_main import _compute_fvd
    from long_video_gan_tpu.metrics.metric_utils import MetricOptions

    run = Path(run_dir)
    config = json.loads((run / "config.json").read_text()) if (run / "config.json").exists() else {}
    dataset_dir = dataset_dir or config.get("dataset_dir")
    assert dataset_dir, "--dataset required (run config.json has no dataset_dir)"
    height = height or config.get("height")
    width = width or config.get("width")

    ckpts = sorted(run.glob("checkpoints/ckpt-*-G-ema.lvg"))
    assert ckpts, f"no G_ema checkpoints under {run}/checkpoints"
    ckpts = ckpts[::every] if ckpts[-1] in ckpts[::every] else ckpts[::every] + [ckpts[-1]]

    sres = load_generator(sres_path) if sres_path else None
    curve_path = run / "metric-curve.jsonl"
    print(f"{len(ckpts)} checkpoints | detector={detector} frames={num_frames} "
          f"items={items} real={height}x{width}\n")
    print(f"{'step':>10}  fvd")
    for ckpt in ckpts:
        step = int(re.search(r"ckpt-(\d+)-G-ema", ckpt.name).group(1))
        module, variables, _ = load_generator(str(ckpt))
        g, lr_g = (module, variables), None
        if sres is not None:
            g, lr_g = (sres[0], sres[1]), (module, variables)
        opts = MetricOptions(
            G=g, lr_G=lr_g, detector=detector, seed=seed,
            dataset_kwargs=dict(dataset_dir=dataset_dir, seq_length=num_frames,
                                height=height, width=width),
        )
        fvd = _compute_fvd(opts, max_real=items, num_gen=items, num_frames=num_frames)
        print(f"{step:>10}  {fvd:.4f}")
        with open(curve_path, "at") as fp:
            fp.write(json.dumps(dict(step=step, fvd=fvd, detector=detector,
                                     frames=num_frames, items=items)) + "\n")
    print(f"\ncurve -> {curve_path}")


if __name__ == "__main__":
    main()
