"""Video frame loading.

Reference behavior: load_video_frames — OpenCV mp4 decode -> resized
frame tensors (data.py:378-392) and create_test_video_dataloader
(data.py:395-405).

This environment has no cv2/ffmpeg; mp4 decode is gated on an available
backend (imageio-ffmpeg, ffmpeg binary) with a clear error otherwise.
Frame-directory videos (the dominant on-disk format in the reference's
datasets) always work.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterator

import numpy as np

from nerf_qa_tpu.data.imaging import load_image_rgb, prepare_image


def _ffmpeg_exe() -> str | None:
    try:
        import imageio_ffmpeg

        return imageio_ffmpeg.get_ffmpeg_exe()
    except Exception:
        pass
    return shutil.which("ffmpeg")


def load_video_frames(
    video_path: str,
    resize: bool = True,
    keep_aspect_ratio: bool = False,
    max_frames: int | None = None,
) -> np.ndarray:
    """Decode a video to (T, H, W, 3) float32 frames in [0,1]
    (data.py:378-392 semantics). Accepts an mp4 file (needs an ffmpeg
    backend) or a directory of frames."""
    if os.path.isdir(video_path):
        files = sorted(
            f for f in os.listdir(video_path) if f.endswith((".png", ".jpg"))
        )
        if max_frames:
            files = files[:max_frames]
        frames = [
            prepare_image(load_image_rgb(os.path.join(video_path, f)),
                          resize=resize, keep_aspect_ratio=keep_aspect_ratio)
            for f in files
        ]
        return np.stack(frames)

    exe = _ffmpeg_exe()
    if exe is None:
        raise RuntimeError(
            "mp4 decode needs an ffmpeg backend (imageio-ffmpeg or the "
            "ffmpeg binary); none found. Extract frames to a directory "
            "(tools/convert_video.py) and pass the directory instead."
        )
    # probe dimensions via ffmpeg, then stream raw RGB frames
    import re

    probe = subprocess.run(
        [exe, "-i", video_path], capture_output=True, text=True
    )
    m = re.search(r"(\d{2,5})x(\d{2,5})", probe.stderr)
    if not m:
        raise RuntimeError(f"could not probe video dimensions: {video_path}")
    w, h = int(m.group(1)), int(m.group(2))
    proc = subprocess.Popen(
        [exe, "-i", video_path, "-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    frames = []
    frame_bytes = w * h * 3
    while True:
        raw = proc.stdout.read(frame_bytes)
        if len(raw) < frame_bytes:
            break
        img = np.frombuffer(raw, np.uint8).reshape(h, w, 3).astype(np.float32) / 255.0
        frames.append(
            prepare_image(img, resize=resize, keep_aspect_ratio=keep_aspect_ratio)
        )
        if max_frames and len(frames) >= max_frames:
            break
    proc.stdout.close()
    proc.wait()
    return np.stack(frames)


def iter_video_batches(
    dist_frames: np.ndarray, ref_frames: np.ndarray, batch_size: int
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Fixed-order batch iterator over a frame pair stack
    (create_test_video_dataloader semantics, data.py:395-405)."""
    for lo in range(0, len(dist_frames), batch_size):
        yield dist_frames[lo:lo + batch_size], ref_frames[lo:lo + batch_size]
