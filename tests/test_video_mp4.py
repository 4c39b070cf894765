"""Native MP4 demux + Motion-JPEG decode round-trip (no ffmpeg/cv2).

The muxer (data.video.write_mjpeg_mp4) and demuxer (native/decoder.cpp
ISO-BMFF parser) are independent implementations of the container spec;
round-tripping frames through them checks both.
"""
import numpy as np
import pytest

from nerf_qa_tpu.data import native
from nerf_qa_tpu.data.video import load_video_frames, write_mjpeg_mp4

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder not built"
)


def _gradient_video(t=5, h=64, w=80):
    """Smooth frames so the JPEG round-trip stays within tight tolerance."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.stack([
        np.stack([
            (yy / h) * 0.8 + i * 0.02,
            (xx / w) * 0.8,
            ((yy + xx) / (h + w)) * 0.8,
        ], axis=-1)
        for i in range(t)
    ])
    return np.clip(frames, 0, 1)


@pytest.fixture(scope="module")
def mp4_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    write_mjpeg_mp4(path, _gradient_video(), fps=10, quality=95)
    return path


def test_probe(mp4_path):
    codec, n, h, w = native.mp4_probe(mp4_path)
    assert codec == "jpeg"
    assert (n, h, w) == (5, 64, 80)


def test_roundtrip_content(mp4_path):
    got = load_video_frames(mp4_path, resize=False)
    assert got.shape == (5, 64, 80, 3)
    np.testing.assert_allclose(got, _gradient_video(), atol=0.04)


def test_max_frames(mp4_path):
    got = load_video_frames(mp4_path, resize=False, max_frames=2)
    assert got.shape == (2, 64, 80, 3)


def test_resize_policy(tmp_path):
    """prepare_image semantics: shortest side > 256 resizes to 256x256
    (or aspect-preserved), otherwise source size (DISTS_pt.py:210-217)."""
    path = str(tmp_path / "big.mp4")
    big = np.clip(_gradient_video(t=2, h=320, w=400), 0, 1)
    write_mjpeg_mp4(path, big, fps=10)
    assert load_video_frames(path).shape == (2, 256, 256, 3)
    assert load_video_frames(path, keep_aspect_ratio=True).shape \
        == (2, 256, 320, 3)
    assert load_video_frames(path, resize=False).shape == (2, 320, 400, 3)


def test_decode_frames_start_offset(mp4_path):
    full = native.mp4_decode_frames(mp4_path, 64, 80)
    tail = native.mp4_decode_frames(mp4_path, 64, 80, start=3)
    assert tail.shape == (2, 64, 80, 3)
    np.testing.assert_array_equal(tail, full[3:])
