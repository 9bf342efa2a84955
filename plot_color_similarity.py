"""Paper-figure tool: color-histogram intersection vs frame separation,
generated vs real (TPU-native equivalent of the reference's
plot_color_similarity.py — the long-horizon color-drift diagnostic).

The similarity between frame 0 and frame t is the intersection of their joint
RGB histograms (bins_per_color^3 bins), averaged over videos with a +-1 std
band.
"""

from __future__ import annotations

import math
from pathlib import Path

import click
import numpy as np


def video_color_intersection(video: np.ndarray, bins_per_color: int = 20) -> np.ndarray:
    """video [C, T, H, W] in [-1, 1] -> similarity[t] between frame 0 and
    frame t+1 (histogram intersection of joint RGB histograms)."""
    assert video.ndim == 4 and video.shape[0] == 3
    c, t, h, w = video.shape
    num_pixels = h * w
    x = (video / 2 + 0.5) * (bins_per_color - 1)
    x = np.clip(np.floor(x + 0.5), 0, bins_per_color - 1).astype(np.int64)
    joint = (x[0] * bins_per_color + x[1]) * bins_per_color + x[2]     # [T, H, W]
    bins = bins_per_color ** 3
    hists = np.stack([np.bincount(f.ravel(), minlength=bins) for f in joint])
    inter = np.minimum(hists[1:], hists[:1]).sum(axis=1)
    return inter / num_pixels


def _accumulate(videos, bins_per_color=20):
    n = 0
    s = 0.0
    ss = 0.0
    for video in videos:
        sim = video_color_intersection(np.asarray(video), bins_per_color)
        n += 1
        s = s + sim
        ss = ss + sim ** 2
    mean = s / n
    std = np.sqrt(np.maximum((ss - n * mean ** 2) / max(n - 1, 1), 0))
    return mean, std


def _plot_series(plt, mean, std, label, color):
    xs = np.arange(mean.shape[0] + 1)
    mean = np.concatenate([[1.0], mean])
    std = np.concatenate([[0.0], std])
    plt.plot(xs, mean, label=label, color=color)
    plt.fill_between(xs, mean - std, mean + std, alpha=0.2, color=color, linewidth=0, zorder=-10)
    plt.plot(xs[-1], mean[-1], marker="o", markersize=4, color=color, zorder=10)


@click.command()
@click.option("--path", type=str, required=True, help="Output image path (pdf/png)")
@click.option("--dataset", "dataset_dir", type=str, required=True)
@click.option("--lres", "lres_path", type=str, required=True)
@click.option("--sres", "sres_path", type=str, default=None)
@click.option("--len", "seq_length", type=int, default=128)
@click.option("--samples", "num_samples", type=int, default=1000)
@click.option("--batch", "batch_size", type=int, default=10)
def main(path, dataset_dir, lres_path, sres_path, seq_length, num_samples, batch_size):
    import os

    import jax

    if os.environ.get("LVG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LVG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from long_video_gan_tpu.data.dataset import VideoDataset
    from long_video_gan_tpu.io.checkpoint import load_generator
    from long_video_gan_tpu.models.generator_sres import sample_video_segments

    lres_G, lres_vars, _ = load_generator(lres_path)
    sres_G = sres_vars = None
    if sres_path is not None:
        sres_G, sres_vars, _ = load_generator(sres_path)

    seq_length += 1
    segment_length = 16
    lr_len = -(-seq_length // segment_length) * segment_length
    if sres_G is not None:
        lr_len += 2 * sres_G.temporal_context
        height, width = sres_G.hr_height, sres_G.hr_width
    else:
        height, width = lres_G.out_height, lres_G.out_width

    dataset = VideoDataset(dataset_dir, seq_length, height, width)
    rng = np.random.default_rng(0)

    lres_apply = jax.jit(lambda v, rng_key: lres_G.apply(v, batch_size, lr_len,
                                                         rngs={"noise": rng_key}))
    if sres_G is not None:
        sres_apply = jax.jit(lambda v, w, z: sres_G.apply(v, w, z=z))

    def generated():
        for i in range(math.ceil(num_samples / batch_size)):
            key = jax.random.key(i)
            lr = lres_apply(lres_vars, jax.random.fold_in(key, 0))
            if sres_G is None:
                video = np.asarray(lr)[:, :, :seq_length]
            else:
                z = jax.random.normal(jax.random.fold_in(key, 1),
                                      (batch_size, sres_G.latent_z_dim))
                segs = sample_video_segments(sres_apply, sres_vars, lr, segment_length,
                                             sres_G.temporal_context, z=z)
                video = np.concatenate([np.asarray(s) for s in segs], axis=2)[:, :, :seq_length]
            yield from video

    def reals():
        for i in range(num_samples):
            yield dataset.sample(int(rng.integers(len(dataset))), rng)["video"]

    print("Computing color intersection for generated videos ...")
    gen_mean, gen_std = _accumulate(generated())
    print("Computing color intersection for dataset videos ...")
    real_mean, real_std = _accumulate(reals())

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(5, 3), dpi=200)
    plt.xlabel("Frame separation")
    plt.ylabel("Color similarity")
    plt.gca().spines["top"].set_visible(False)
    plt.gca().spines["right"].set_visible(False)
    _plot_series(plt, gen_mean, gen_std, "LongVideoGAN (TPU)", "tab:blue")
    _plot_series(plt, real_mean, real_std, "Dataset", "tab:orange")
    plt.xlim(0, seq_length + 2)
    plt.ylim(0, 1)
    plt.legend(loc="upper right", frameon=False)
    plt.tight_layout()
    plt.savefig(path)
    print(f"Saved plot {path}")


if __name__ == "__main__":
    main()
