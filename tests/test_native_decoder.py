"""Native C++ decoder parity vs the PIL path."""
import numpy as np
import pytest
from PIL import Image

from nerf_qa_tpu.data import native
from nerf_qa_tpu.data.imaging import load_image_rgb, resize_image

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder not built"
)


@pytest.fixture()
def png_path(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    return str(p)


@pytest.fixture()
def jpg_path(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, quality=95)
    return str(p)


def test_image_size(png_path):
    assert native.image_size(png_path) == (48, 64)


def test_png_decode_matches_pil(png_path):
    ours = native.decode_resize(png_path, 48, 64)
    ref = load_image_rgb(png_path)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_png_resize_matches_host_resize(png_path):
    ours = native.decode_resize(png_path, 32, 32)
    ref = resize_image(load_image_rgb(png_path), 32, 32)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_jpeg_decode_matches_pil(jpg_path):
    ours = native.decode_resize(jpg_path, 40, 56)
    ref = load_image_rgb(jpg_path)
    # JPEG decoders may differ by a few LSBs in IDCT rounding
    assert np.abs(ours - ref).max() <= 2.5 / 255


def test_rgba_white_composite(tmp_path):
    arr = np.zeros((8, 8, 4), np.uint8)
    arr[..., 0] = 200
    arr[..., 3] = 128  # half transparent red
    p = tmp_path / "rgba.png"
    Image.fromarray(arr, "RGBA").save(p)
    ours = native.decode_resize(str(p), 8, 8)
    ref = load_image_rgb(str(p))
    np.testing.assert_allclose(ours, ref, atol=1 / 255 + 1e-6)


def test_batch_decode(png_path, jpg_path):
    batch = native.decode_resize_batch([png_path, jpg_path, png_path], 32, 32,
                                       threads=3)
    assert batch.shape == (3, 32, 32, 3)
    single = native.decode_resize(png_path, 32, 32)
    np.testing.assert_allclose(batch[0], single, atol=1e-6)
    np.testing.assert_allclose(batch[2], single, atol=1e-6)


def test_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native.decode_resize(str(tmp_path / "nope.png"), 16, 16)
