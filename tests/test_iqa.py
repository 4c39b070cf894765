"""PSNR/SSIM/MS-SSIM sanity + cross-checks."""
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_qa_tpu.eval.iqa import ms_ssim, psnr, ssim


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    x = rng.random((2, 96, 96, 3), dtype=np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    return jnp.asarray(x), jnp.asarray(y)


def test_psnr_known_value():
    x = jnp.zeros((1, 8, 8, 3))
    y = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20
    np.testing.assert_allclose(np.asarray(psnr(x, y)), [20.0], rtol=1e-5)


def test_psnr_identical_is_large(pair):
    x, _ = pair
    assert float(psnr(x, x)[0]) > 100


def test_ssim_identical_is_one(pair):
    x, _ = pair
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-6)


def test_ssim_decreases_with_noise(pair):
    x, y = pair
    s = np.asarray(ssim(x, y))
    assert (s < 1.0).all() and (s > 0.0).all()
    worse = jnp.clip(y + 0.2, 0, 1)
    assert (np.asarray(ssim(x, worse)) < s).all()


def test_ssim_matches_direct_formula():
    """Cross-check against an independent dense NCHW implementation."""
    import torch
    import torch.nn.functional as F
    from nerf_qa_tpu.eval.iqa import _gaussian_kernel

    rng = np.random.default_rng(1)
    x = rng.random((1, 32, 32, 1), dtype=np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y))[0])

    t = _gaussian_kernel()
    w2 = torch.from_numpy(np.outer(t, t).astype(np.float32))[None, None]
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = torch.from_numpy(y).permute(0, 3, 1, 2)
    mu_x = F.conv2d(tx, w2)
    mu_y = F.conv2d(ty, w2)
    vx = F.conv2d(tx * tx, w2) - mu_x**2
    vy = F.conv2d(ty * ty, w2) - mu_y**2
    cov = F.conv2d(tx * ty, w2) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    ref = (((2 * mu_x * mu_y + c1) * (2 * cov + c2))
           / ((mu_x**2 + mu_y**2 + c1) * (vx + vy + c2))).mean().item()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ms_ssim_identical_is_one():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 192, 192, 3), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(ms_ssim(x, x)), 1.0, atol=1e-5)


def test_ms_ssim_orders_distortions():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 192, 192, 3), dtype=np.float32))
    mild = jnp.clip(x + 0.02, 0, 1)
    harsh = jnp.clip(x + jnp.asarray(
        rng.normal(0, 0.2, x.shape).astype(np.float32)), 0, 1)
    assert float(ms_ssim(x, mild)[0]) > float(ms_ssim(x, harsh)[0])


def test_lpips_identical_is_zero_and_orders_distortions():
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.eval.iqa import lpips

    vgg = init_vgg16_params(seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    mild = jnp.clip(x + 0.03, 0, 1)
    harsh = jnp.clip(x + 0.2, 0, 1)
    np.testing.assert_allclose(np.asarray(lpips(vgg, x, x)), 0.0, atol=1e-5)
    lm = np.asarray(lpips(vgg, x, mild))
    lh = np.asarray(lpips(vgg, x, harsh))
    assert (lm > 0).all() and (lh > lm).all(), (lm, lh)


def test_gmsd_identical_is_zero_and_orders_distortions():
    from nerf_qa_tpu.eval.iqa import gmsd

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 96, 96, 3), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(gmsd(x, x)), 0.0, atol=1e-6)
    mild = jnp.clip(x + jnp.asarray(
        rng.normal(0, 0.03, x.shape).astype(np.float32)), 0, 1)
    harsh = jnp.clip(x + jnp.asarray(
        rng.normal(0, 0.25, x.shape).astype(np.float32)), 0, 1)
    gm = np.asarray(gmsd(x, mild))
    gh = np.asarray(gmsd(x, harsh))
    assert (gm > 0).all() and (gh > gm).all(), (gm, gh)


def test_gmsd_matches_direct_formula():
    """Cross-check against an independent dense torch implementation of
    Xue et al. 2014 (luminance/255, 2x2 avg-pool s2, Prewitt/3, c=170)."""
    import torch
    import torch.nn.functional as F

    from nerf_qa_tpu.eval.iqa import gmsd

    rng = np.random.default_rng(5)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    ours = float(np.asarray(gmsd(jnp.asarray(x), jnp.asarray(y)))[0])

    def lum(v):
        v = torch.from_numpy(v).permute(0, 3, 1, 2) * 255.0
        return (0.299 * v[:, :1] + 0.587 * v[:, 1:2] + 0.114 * v[:, 2:3])

    tx, ty = F.avg_pool2d(lum(x), 2), F.avg_pool2d(lum(y), 2)
    hx = torch.tensor([[1., 0., -1.]] * 3)[None, None] / 3.0
    def gm(v):
        gx = F.conv2d(v, hx, padding=1)
        gy = F.conv2d(v, hx.transpose(2, 3), padding=1)
        return torch.sqrt(gx * gx + gy * gy + 1e-12)

    gmx, gmy = gm(tx), gm(ty)
    gms = (2 * gmx * gmy + 170.0) / (gmx**2 + gmy**2 + 170.0)
    ref = torch.std(gms, unbiased=False).item()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_lpips_lin_weight_converter():
    """Official lpips vgg.pth layout -> per-stage channel vectors, and
    the converted weights actually recalibrate the score."""
    torch = pytest.importorskip("torch")

    from nerf_qa_tpu.compat.torch_weights import convert_lpips_lin
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.eval.iqa import LPIPS_STAGE_CHANNELS, lpips

    rng = np.random.default_rng(1)
    sd = {
        f"lin{k}.model.1.weight": torch.from_numpy(
            rng.uniform(0, 0.1, (1, c, 1, 1)).astype(np.float32))
        for k, c in enumerate(LPIPS_STAGE_CHANNELS)
    }
    lin = convert_lpips_lin(sd)
    assert [w.shape for w in lin] == [(c,) for c in LPIPS_STAGE_CHANNELS]

    vgg = init_vgg16_params(seed=0)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    y = jnp.clip(x + 0.1, 0, 1)
    uniform = float(np.asarray(lpips(vgg, x, y))[0])
    weighted = float(np.asarray(lpips(vgg, x, y, lin))[0])
    assert np.isfinite(weighted) and abs(weighted - uniform) > 1e-6
