"""Build a dataset from YouTube videos listed in a clip-interval config.

Equivalent of the reference's dataset_tools/make_dataset_from_youtube.py:
a JSON config maps video ids to lists of [start, end] time intervals
(e.g. the released horseback.json with 44 videos / biking.json with 28);
each interval becomes one clip directory of JPEG frames in the ZIP shard.

Downloading requires yt-dlp, which is not part of this image — the tool also
accepts pre-downloaded files via --video-dir (files named <video_id>.<ext>),
so the deterministic decode/crop/shard stage runs fully offline.

Config format (same as the reference's youtube_configs/*.json):
    {"<video_id>": [["0:10", "0:55"], ["1:20", "2:03"]], ...}
"""

from __future__ import annotations

import json
import shutil
import subprocess
from pathlib import Path

import click

from .common import FrameWriteBuffer, center_crop_and_resize, time_str_to_sec, write_frame_index
from .make_dataset_from_videos import iter_video_frames


def download_video(video_id: str, out_dir: Path) -> Path | None:
    if shutil.which("yt-dlp") is None:
        raise RuntimeError(
            "yt-dlp is not installed in this environment; download videos "
            "elsewhere and pass --video-dir with files named <video_id>.<ext>")
    out = out_dir / f"{video_id}.mp4"
    if out.is_file():
        return out
    cmd = ["yt-dlp", "-f", "bestvideo[ext=mp4]/best", "-o", str(out),
           f"https://www.youtube.com/watch?v={video_id}"]
    subprocess.run(cmd, check=True)
    return out


def find_video_file(video_dir: Path, video_id: str) -> Path | None:
    for p in video_dir.glob(f"{video_id}.*"):
        return p
    return None


@click.command()
@click.option("--config", "config_path", type=str, required=True,
              help="JSON: {video_id: [[start, end], ...]}")
@click.option("--output", "output_dir", type=str, required=True)
@click.option("--video-dir", type=str, default=None,
              help="Directory of pre-downloaded videos (skips yt-dlp)")
@click.option("--height", type=int, required=True)
@click.option("--width", type=int, required=True)
@click.option("--partition", type=int, default=0)
@click.option("--num-partitions", type=int, default=1)
def main(config_path, output_dir, video_dir, height, width, partition, num_partitions):
    config = json.loads(Path(config_path).read_text())
    res_dir = Path(output_dir) / f"{height:04d}x{width:04d}"
    res_dir.mkdir(parents=True, exist_ok=True)
    zip_path = res_dir / f"partition_{partition:04d}.zip"

    video_ids = sorted(config.keys())[partition::num_partitions]
    index = {}
    for video_id in video_ids:
        if video_dir:
            path = find_video_file(Path(video_dir), video_id)
            if path is None:
                print(f"Missing video file for {video_id}, skipping")
                continue
        else:
            path = download_video(video_id, res_dir.parent / "raw")

        for clip_idx, (start, end) in enumerate(config[video_id]):
            t0, t1 = time_str_to_sec(start), time_str_to_sec(end)
            clip = f"{video_id}/clip_{clip_idx:04d}"
            writer = FrameWriteBuffer(zip_path, quality=100, subsampling=0)
            names = []
            for i, frame in enumerate(iter_video_frames(path, trim_start=t0, end_time=t1)):
                frame = center_crop_and_resize(frame, height, width)
                name = f"frame_{i:06d}.jpg"
                names.append(name)
                writer.add(f"{clip}/{name}", frame)
            writer.flush()
            if names:
                index[clip] = names
            print(f"{clip}: {len(names)} frames")

    write_frame_index(zip_path, index)
    print(f"Wrote {zip_path}")


if __name__ == "__main__":
    main()
