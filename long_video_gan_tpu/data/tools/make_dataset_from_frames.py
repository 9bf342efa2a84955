"""Build a ZIP-shard frame dataset from directories of image frames.

Equivalent of the reference's dataset_tools/make_dataset_from_frames.py:
scans clip directories of images, center-crop-resizes (Lanczos), writes JPEG
q95 shards + frame_paths.json.

    python -m long_video_gan_tpu.data.tools.make_dataset_from_frames \\
        --input frames/ --output datasets/mine --height 36 --width 64
"""

from __future__ import annotations

import json
from pathlib import Path

import click
from PIL import Image

from .common import FrameWriteBuffer, center_crop_and_resize, run_parallel, write_frame_index

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def scan_clip_dirs(input_dir: str, cache: bool = True) -> dict[str, list[str]]:
    """Map clip dir (relative) -> sorted frame file names; cached to
    frame_paths.json beside the input (reference :53-98)."""
    root = Path(input_dir)
    cache_path = root / "frame_paths.json"
    if cache and cache_path.is_file():
        return json.loads(cache_path.read_text())
    clips: dict[str, list[str]] = {}
    for p in sorted(root.rglob("*")):
        if p.suffix.lower() in IMAGE_EXTENSIONS:
            clips.setdefault(str(p.parent.relative_to(root)), []).append(p.name)
    clips = {k: sorted(v) for k, v in clips.items()}
    if cache:
        cache_path.write_text(json.dumps(clips))
    return clips


def save_frame_clip(zip_path: Path, input_root: Path, clip: str, names: list[str],
                    height: int, width: int) -> tuple[str, list[str]]:
    writer = FrameWriteBuffer(zip_path, quality=95)
    out_names = []
    for index, name in enumerate(names):
        frame = Image.open(input_root / clip / name).convert("RGB")
        frame = center_crop_and_resize(frame, height, width)
        out_name = f"frame_{index:06d}.jpg"
        out_names.append(out_name)
        writer.add(f"{clip}/{out_name}", frame)
    writer.flush()
    return clip, out_names


@click.command()
@click.option("--input", "input_dir", type=str, required=True)
@click.option("--output", "output_dir", type=str, required=True)
@click.option("--height", type=int, required=True)
@click.option("--width", type=int, required=True)
@click.option("--partition", type=int, default=0)
@click.option("--num-partitions", type=int, default=1)
@click.option("--workers", type=int, default=8)
def main(input_dir, output_dir, height, width, partition, num_partitions, workers):
    res_dir = Path(output_dir) / f"{height:04d}x{width:04d}"
    res_dir.mkdir(parents=True, exist_ok=True)
    zip_path = res_dir / f"partition_{partition:04d}.zip"

    clips = sorted(scan_clip_dirs(input_dir).items())
    clips = clips[partition::num_partitions]
    print(f"Partition {partition}/{num_partitions}: {len(clips)} clips -> {zip_path}")

    results = run_parallel(
        lambda clip, names: save_frame_clip(zip_path, Path(input_dir), clip, names,
                                            height, width),
        clips, num_workers=workers, desc="Encoding clips")
    write_frame_index(zip_path, dict(results))
    print(f"Wrote {zip_path}")


if __name__ == "__main__":
    main()
