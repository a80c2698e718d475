"""Dataset fetch helper: download + trim raw videos from a CSV listing.

Equivalent of `/root/reference/scripts/video_download.py`: for each
(video_id, url, start, end) row, download with yt-dlp and cut the clip with
ffmpeg. Both tools are optional system dependencies; the script degrades
with a clear message if they are missing (this framework consumes
pre-extracted features, so the raw videos are only needed to re-extract).

Usage:
    python scripts/video_download.py listing.csv out_dir/
CSV columns: video_id,url,start_sec,end_sec
"""

from __future__ import annotations

import csv
import os
import shutil
import subprocess
import sys


def have(tool: str) -> bool:
    return shutil.which(tool) is not None


def download_video(url: str, out_path: str) -> bool:
    cmd = [
        "yt-dlp", "-f", "mp4", "-o", out_path, "--no-playlist", url,
    ]
    return subprocess.run(cmd).returncode == 0


def cut_video(src: str, dst: str, start: float, end: float) -> bool:
    cmd = [
        "ffmpeg", "-y", "-i", src,
        "-ss", str(start), "-to", str(end),
        "-c", "copy", dst,
    ]
    return subprocess.run(cmd).returncode == 0


def main(listing_csv: str, out_dir: str):
    if not have("yt-dlp") or not have("ffmpeg"):
        sys.exit(
            "yt-dlp and ffmpeg are required for raw video download; "
            "install them or work from pre-extracted features."
        )
    os.makedirs(out_dir, exist_ok=True)
    tmp_dir = os.path.join(out_dir, "_raw")
    os.makedirs(tmp_dir, exist_ok=True)

    with open(listing_csv) as f:
        for row in csv.DictReader(f):
            vid = row["video_id"]
            raw = os.path.join(tmp_dir, f"{vid}.mp4")
            final = os.path.join(out_dir, f"{vid}.mp4")
            if os.path.exists(final):
                continue
            if not os.path.exists(raw) and not download_video(row["url"], raw):
                print(f"[skip] download failed: {vid}")
                continue
            if not cut_video(raw, final, float(row["start_sec"]),
                             float(row["end_sec"])):
                print(f"[skip] trim failed: {vid}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
