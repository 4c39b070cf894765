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


def test_fast_decode_metric_impact_is_bounded():
    """VERDICT r4 item 4: quantify the fast-decode quality caveat.

    The DCT-scaled decode antialiases where the full-decode->bilinear
    path aliases, attenuating per-pixel-noise distortion signal. Score
    the SAME noisy-render/reference 1080p JPEG pairs through both feeds
    and pin the DISTS delta to a measured bound (recorded in PARITY.md
    next to the README caveat). Feed shapes: 1080p -> 256^2, the
    production scoring path, where fast decode picks a 1/4 DCT scale."""
    if not native.fast_decode_available():
        pytest.skip("fast-decode ABI not in this .so")
    import jax.numpy as jnp

    from nerf_qa_tpu.compat.pretrained import resolve_dists_weights
    from nerf_qa_tpu.config import DISTSConfig
    from nerf_qa_tpu.core import dists
    from nerf_qa_tpu.core.vgg import init_vgg16_params

    rng = np.random.default_rng(0)
    h, w = 1080, 1920
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1)
    tmp = __import__("tempfile").mkdtemp()
    import os

    lowf = 0.06 * np.sin(xx / 120.0) * np.cos(yy / 90.0)
    rp, dp_noise, dp_lowf = [], [], []
    for i in range(2):
        ref = np.clip(base * 0.7 + rng.normal(0.15, 0.08, (h, w, 3)), 0, 1)
        noise = np.clip(ref + rng.normal(0, 0.04, (h, w, 3)), 0, 1)
        smooth = np.clip(ref + lowf[..., None], 0, 1)
        a = os.path.join(tmp, f"r{i}.jpg")
        bn = os.path.join(tmp, f"dn{i}.jpg")
        bl = os.path.join(tmp, f"dl{i}.jpg")
        Image.fromarray((ref * 255).astype(np.uint8)).save(a, quality=90)
        Image.fromarray((noise * 255).astype(np.uint8)).save(bn, quality=90)
        Image.fromarray((smooth * 255).astype(np.uint8)).save(bl, quality=90)
        rp.append(a)
        dp_noise.append(bn)
        dp_lowf.append(bl)

    cfg = DISTSConfig(compute_dtype="float32")
    vgg = init_vgg16_params(seed=0)
    wts = resolve_dists_weights(cfg)

    def score(paths_d, paths_r, fast):
        d = native.decode_resize_batch(paths_d, 256, 256, threads=1,
                                       fast=fast)
        r = native.decode_resize_batch(paths_r, 256, 256, threads=1,
                                       fast=fast)
        return np.asarray(dists.forward(
            vgg, wts, jnp.asarray(d), jnp.asarray(r), cfg))

    # Regime 1 — per-pixel-noise distortion: the DCT-scaled decode
    # averages the noise away before DISTS sees it. Measured (seed 0):
    # fast/full score ratio ~0.13, i.e. ~87% of the distortion signal
    # is suppressed — the reason NERF_QA_TPU_FAST_DECODE is opt-in.
    n_full = score(dp_noise, rp, fast=False)
    n_fast = score(dp_noise, rp, fast=True)
    assert (n_full > 0).all() and (n_fast > 0).all()
    ratio = n_fast / n_full
    assert (ratio < 0.35).all(), (n_full, n_fast)
    assert (ratio > 0.03).all(), (n_full, n_fast)

    # Regime 2 — low-frequency distortion (smooth luminance field):
    # the distortion survives both feeds; scores stay within ~20%
    # relative (measured: +16% — removing the shared decode-noise floor
    # makes the smooth distortion slightly MORE visible).
    l_full = score(dp_lowf, rp, fast=False)
    l_fast = score(dp_lowf, rp, fast=True)
    rel = np.abs(l_full - l_fast) / np.abs(l_full)
    assert rel.max() < 0.30, (l_full, l_fast, rel)
