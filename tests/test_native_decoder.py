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


# --- DCT-scaled fast decode (nqa_decode_resize2) ------------------------


@pytest.fixture()
def big_jpg_path(tmp_path):
    """512x768 natural-ish content (smooth gradient + mild texture): the
    feed-path shape where fast decode picks a 1/2 DCT scale for a 256²
    target."""
    h, w = 512, 768
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1) * 0.8
    rng = np.random.default_rng(2)
    img = np.clip(img + rng.normal(0.1, 0.03, (h, w, 3)), 0, 1)
    p = tmp_path / "big.jpg"
    Image.fromarray((img * 255).astype(np.uint8)).save(p, quality=92)
    return str(p)


def test_fast_decode_available():
    assert native.fast_decode_available()


def test_fast_jpeg_close_to_exact(big_jpg_path):
    exact = native.decode_resize(big_jpg_path, 256, 256)
    fast = native.decode_resize(big_jpg_path, 256, 256, fast=True)
    # different downsample kernel (DCT-domain 1/2 then bilinear vs direct
    # bilinear), same image content: small mean delta on natural content
    diff = np.abs(fast - exact)
    assert diff.mean() < 0.01, diff.mean()
    assert diff.max() < 0.15, diff.max()


def test_fast_noop_when_no_downscale(jpg_path):
    # source 40x56, target 40x56: no 1/d scale covers the target -> the
    # fast path must take the identical full-decode route
    exact = native.decode_resize(jpg_path, 40, 56)
    fast = native.decode_resize(jpg_path, 40, 56, fast=True)
    np.testing.assert_array_equal(fast, exact)


def test_fast_png_identical(png_path):
    # PNG has no scaled decode: fast flag must be a no-op
    exact = native.decode_resize(png_path, 32, 32)
    fast = native.decode_resize(png_path, 32, 32, fast=True)
    np.testing.assert_array_equal(fast, exact)


def test_fast_batch(big_jpg_path, png_path):
    batch = native.decode_resize_batch([big_jpg_path, png_path], 256, 256,
                                       threads=2, fast=True)
    assert batch.shape == (2, 256, 256, 3)
    single = native.decode_resize(big_jpg_path, 256, 256, fast=True)
    np.testing.assert_allclose(batch[0], single, atol=1e-6)
