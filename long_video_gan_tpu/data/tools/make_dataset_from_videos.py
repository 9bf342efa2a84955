"""Build a ZIP-shard frame dataset from video files.

Equivalent of the reference's dataset_tools/make_dataset_from_videos.py (PyAV
decode -> trim -> center-crop-resize Lanczos -> JPEG q100 no-subsampling ->
ZIP shard, shard selected by --partition/--num-partitions for parallel
machines). This image ships OpenCV instead of PyAV for decoding; output format
is identical.

    python -m long_video_gan_tpu.data.tools.make_dataset_from_videos \\
        --input videos/ --output datasets/mine --height 144 --width 256
"""

from __future__ import annotations

from pathlib import Path

import click
from PIL import Image

from .common import FrameWriteBuffer, center_crop_and_resize, resize_long_edge, run_parallel, write_frame_index

VIDEO_EXTENSIONS = (".avi", ".mkv", ".mov", ".mp4", ".wmv", ".webm")


def iter_video_frames(video_path: str, trim_start: float = 0.0, trim_end: float = 0.0,
                      end_time: float | None = None):
    """Decode frames as PIL RGB images with cv2 (timestamps in seconds).
    `trim_end` trims from the video's end; `end_time` is an absolute cutoff."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        print(f"Failed to open video file: {video_path}")
        return
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    total = cap.get(cv2.CAP_PROP_FRAME_COUNT)
    duration = total / fps if total > 0 else float("inf")
    end_time = min(duration - trim_end, end_time if end_time is not None else float("inf"))
    if trim_start > 0:
        cap.set(cv2.CAP_PROP_POS_MSEC, trim_start * 1000.0)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        t = cap.get(cv2.CAP_PROP_POS_MSEC) / 1000.0
        if t > end_time:
            break
        yield Image.fromarray(frame[:, :, ::-1])  # BGR -> RGB
    cap.release()


def save_video_clip(zipfile_path: Path, video_path: Path, relative_dir: Path,
                    height, width, long_edge, trim_start: float = 0.0,
                    trim_end: float = 0.0) -> tuple[str, list[str]]:
    """Decode one video into JPEG frames appended to the shard; returns
    (clip_path, frame_names) for the index (reference :27-88)."""
    writer = FrameWriteBuffer(zipfile_path, quality=100, subsampling=0)
    frame_names = []
    for index, frame in enumerate(iter_video_frames(video_path, trim_start, trim_end)):
        if height is not None and width is not None:
            frame = center_crop_and_resize(frame, height, width)
        elif long_edge is not None:
            frame = resize_long_edge(frame, long_edge)
        name = f"frame_{index:06d}.jpg"
        frame_names.append(name)
        writer.add(str(relative_dir / name), frame)
    writer.flush()
    return str(relative_dir), frame_names


def list_video_paths(input_dir: str) -> list[tuple[Path, Path]]:
    root = Path(input_dir)
    if not root.is_dir():
        raise ValueError(f"Directory not found: {input_dir}")
    out = []
    for p in sorted(root.rglob("*")):
        if p.suffix.lower() in VIDEO_EXTENSIONS:
            out.append((p, p.relative_to(root).with_suffix("")))
    return out


@click.command()
@click.option("--input", "input_dir", type=str, required=True)
@click.option("--output", "output_dir", type=str, required=True)
@click.option("--height", type=int, default=None)
@click.option("--width", type=int, default=None)
@click.option("--long-edge", type=int, default=None)
@click.option("--trim-start", type=float, default=0.0)
@click.option("--trim-end", type=float, default=0.0)
@click.option("--partition", type=int, default=0)
@click.option("--num-partitions", type=int, default=1, help="Shard count; run one process per partition")
@click.option("--workers", type=int, default=4)
def main(input_dir, output_dir, height, width, long_edge, trim_start, trim_end,
         partition, num_partitions, workers):
    assert (height and width) or long_edge, "pass --height/--width or --long-edge"
    res_name = f"{height:04d}x{width:04d}" if height else f"long{long_edge}"
    res_dir = Path(output_dir) / res_name
    res_dir.mkdir(parents=True, exist_ok=True)
    zip_path = res_dir / f"partition_{partition:04d}.zip"

    videos = list_video_paths(input_dir)
    videos = videos[partition::num_partitions]
    print(f"Partition {partition}/{num_partitions}: {len(videos)} videos -> {zip_path}")

    results = run_parallel(
        lambda vp, rd: save_video_clip(zip_path, vp, rd, height, width, long_edge,
                                       trim_start, trim_end),
        videos, num_workers=workers, desc="Encoding videos")
    index = {clip: names for clip, names in results if names}
    write_frame_index(zip_path, index)
    print(f"Wrote {zip_path} with {sum(len(v) for v in index.values())} frames")


if __name__ == "__main__":
    main()
