"""Fused windowed T/S distortion-map kernel vs the XLA composition."""
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_qa_tpu.ops.pallas.windowed_tsd import fits_kernel, windowed_tsd
from nerf_qa_tpu.ops.windowed import window_mean


def _xla_tsd(fx, fy, ps, weights, ws=21):
    fx = jnp.asarray(fx)
    fy = jnp.asarray(fy)
    xm = window_mean(fx, ws)
    ym = window_mean(fy, ws)
    xv = window_mean(fx * fx, ws) - jnp.square(xm)
    yv = window_mean(fy * fy, ws) - jnp.square(ym)
    cov = window_mean(fx * fy, ws) - xm * ym
    t = (2 * xm * ym + 1e-6) / (jnp.square(xm) + jnp.square(ym) + 1e-6)
    s = (2 * cov + 1e-6) / (xv + yv + 1e-6)
    p = jnp.asarray(ps)[..., None]
    d = ((1.0 - p) * t + p * s) * jnp.asarray(weights)[:, None, None, :]
    return np.asarray(d.sum(axis=-1))


@pytest.mark.parametrize("shape", [(2, 32, 32, 24), (1, 64, 48, 3)])
def test_matches_xla_composition(shape):
    rng = np.random.default_rng(0)
    n, h, w, c = shape
    # l2-normalized-feature-like magnitudes
    fx = rng.normal(size=shape).astype(np.float32) * 0.05
    fy = (fx + rng.normal(size=shape).astype(np.float32) * 0.01)
    hk, wk = h - 20, w - 20
    ps = rng.random((n, hk, wk), dtype=np.float32)
    weights = rng.random((n, c), dtype=np.float32)
    want = _xla_tsd(fx, fy, ps, weights)
    got = np.asarray(windowed_tsd(fx, fy, ps, weights))
    assert got.shape == (n, hk, wk)
    # kernel computes in bf16 inputs/fp32 accumulation
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_ps_4d_accepted():
    rng = np.random.default_rng(1)
    fx = rng.normal(size=(1, 32, 32, 8)).astype(np.float32) * 0.1
    ps = rng.random((1, 12, 12, 1), dtype=np.float32)
    w = np.ones((1, 8), np.float32)
    out = windowed_tsd(fx, fx, ps, w)
    # identical pair: T=S=1 everywhere -> D = sum of weights
    np.testing.assert_allclose(out, 8.0, rtol=2e-2)


def test_adists_forward_fused_matches_xla():
    """End-to-end ADISTS with the fused kernel vs the XLA path (bf16)."""
    from nerf_qa_tpu.config import ADISTSConfig
    from nerf_qa_tpu.core import adists
    from nerf_qa_tpu.core.vgg import init_vgg16_params

    vgg = init_vgg16_params(seed=0)
    rng = np.random.default_rng(2)
    x = rng.random((2, 64, 64, 3), dtype=np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    base = ADISTSConfig(compute_dtype="bfloat16", fused_tsd=False)
    fused = ADISTSConfig(compute_dtype="bfloat16", fused_tsd=True)
    want = np.asarray(adists.forward(vgg, jnp.asarray(x), jnp.asarray(y),
                                     base, as_loss=False))
    got = np.asarray(adists.forward(vgg, jnp.asarray(x), jnp.asarray(y),
                                    fused, as_loss=False))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_rejects_oversized_width():
    with pytest.raises(ValueError):
        windowed_tsd(np.zeros((1, 32, 600, 4), np.float32),
                     np.zeros((1, 32, 600, 4), np.float32),
                     np.zeros((1, 12, 580), np.float32),
                     np.zeros((1, 4), np.float32))
    assert not fits_kernel(32, 600)
    assert fits_kernel(256, 256)
