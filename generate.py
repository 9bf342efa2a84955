"""Inference CLI: generate long videos through the two-stage pipeline.

TPU-native equivalent of the reference's generate.py: load lres + sres
generator checkpoints, synthesize the full low-res video in one pass (length
rounded up to a 16-multiple plus the sres temporal context), stream the
super-resolution through sliding windows with a shared z, and write an mp4
(plus optional per-frame PNGs / the raw lres video).
"""

from __future__ import annotations

import os
from pathlib import Path

import click
import numpy as np


@click.command()
@click.option("--lres", "lres_path", type=str, required=True, help="lres G_ema checkpoint")
@click.option("--sres", "sres_path", type=str, default=None, help="sres G_ema checkpoint")
@click.option("--output", type=str, required=True, help="Output mp4 path")
@click.option("--seed", type=int, default=49)
@click.option("--frames", "num_frames", type=int, default=301)
@click.option("--fps", type=int, default=30)
@click.option("--batch", "batch_size", type=int, default=1)
@click.option("--segment-length", type=int, default=16)
@click.option("--save-lres", is_flag=True, default=False, help="Also write the low-res video")
@click.option("--save-frames", is_flag=True, default=False, help="Write per-frame PNGs")
@click.option("--save-index", "-i", "save_frame_indices", type=int, multiple=True,
              default=[], help="Frame indices to also save as PNGs (reference "
                               "generate.py:26; --save-frames writes all)")
@click.option("--truncation-psi", type=float, default=1.0)
@click.option("--prefetch", type=int, default=1,
              help="sres segments dispatched ahead of the one being consumed "
                   "(device synthesizes while the host encodes; each costs "
                   "one hr segment of HBM)")
def main(lres_path, sres_path, output, seed, num_frames, fps, batch_size,
         segment_length, save_lres, save_frames, save_frame_indices,
         truncation_psi, prefetch):
    import jax
    import jax.numpy as jnp

    if os.environ.get("LVG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LVG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # A dead axon tunnel must yield a one-line diagnosis, not a silent hang.
    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(os.environ.get("LVG_INIT_TIMEOUT", "120")))

    from long_video_gan_tpu.io.checkpoint import load_generator
    from long_video_gan_tpu.utils.fetch import resolve_path

    # URL checkpoints download into the local cache (reference generate.py
    # accepts URLs via dnnlib.util.open_url, /root/reference/utils.py:53-56).
    lres_path = resolve_path(lres_path)
    if sres_path is not None:
        sres_path = resolve_path(sres_path)
    from long_video_gan_tpu.models.generator_sres import sample_video_segments
    from long_video_gan_tpu.utils.video import save_image_grid, write_video_grid

    out_path = Path(output)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    lres_G, lres_vars, _ = load_generator(lres_path)
    key = jax.random.key(seed)
    k_lres, k_z = jax.random.split(key)

    temporal_context = 0
    if sres_path is not None:
        sres_G, sres_vars, _ = load_generator(sres_path)
        temporal_context = sres_G.temporal_context

    # Round the lres length up to a segment multiple + context halo
    # (reference generate.py:60-64).
    lr_len = -(-num_frames // segment_length) * segment_length + 2 * temporal_context
    print(f"Generating {lr_len}-frame low-res video ...")
    lres_apply = jax.jit(lambda v, rng: lres_G.apply(v, batch_size, lr_len,
                                                     rngs={"noise": rng}))
    lr_video = lres_apply(lres_vars, k_lres)

    save_frame_indices = sorted({i for i in save_frame_indices if 0 <= i < num_frames})

    def save_indexed_frame(video_nchw, index):
        frame_out = out_path.with_name(f"{out_path.stem}-frame{index:04d}.png")
        save_image_grid(video_nchw, frame_out)
        print(f"Wrote {frame_out}")

    if save_lres or sres_path is None:
        lr_out = out_path.with_name(out_path.stem + "-lres" + out_path.suffix)
        t0 = temporal_context
        write_video_grid(np.asarray(lr_video[:, :, t0:t0 + num_frames]), lr_out, fps=fps)
        print(f"Wrote {lr_out}")
        if sres_path is None:
            for i in save_frame_indices:
                save_indexed_frame(np.asarray(lr_video[:, :, t0 + i]), i)
            return

    print(f"Super-resolving in segments of {segment_length} ...")
    z = jax.random.normal(k_z, (batch_size, sres_G.latent_z_dim))
    sres_apply = jax.jit(
        lambda v, w, z: sres_G.apply(v, w, z=z, truncation_psi=truncation_psi))

    segments = []
    written = 0
    frames_dir = out_path.with_suffix("") if save_frames else None
    for seg in sample_video_segments(sres_apply, sres_vars, lr_video,
                                     segment_length=segment_length,
                                     temporal_context=temporal_context, z=z,
                                     prefetch=prefetch):
        seg = np.asarray(seg)
        keep = min(seg.shape[2], num_frames - written)
        if keep <= 0:
            break
        seg = seg[:, :, :keep]
        segments.append(seg)
        if frames_dir is not None:
            frames_dir.mkdir(parents=True, exist_ok=True)
            for t in range(seg.shape[2]):
                save_image_grid(seg[:, :, t], frames_dir / f"{written + t:06d}.png")
        for i in save_frame_indices:
            if written <= i < written + keep:
                save_indexed_frame(seg[:, :, i - written], i)
        written += keep
        print(f"  {written}/{num_frames} frames")

    write_video_grid(iter(segments), out_path, fps=fps)
    print(f"Wrote {out_path}")


if __name__ == "__main__":
    main()
