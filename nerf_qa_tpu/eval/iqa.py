"""Classical IQA metrics: PSNR, SSIM, MS-SSIM (batched, TPU-jittable).

The reference's prep/analysis compare DISTS against SSIM/PSNR/LPIPS/...
columns shipped inside its score CSVs (prep.py:344-394,
results_table*.tex competitor rows). Those columns came from external
tools; this module computes the classical ones natively so the full
comparison pipeline is self-contained.

SSIM follows Wang et al. 2004: 11x11 Gaussian window (sigma 1.5),
K1=0.01, K2=0.03, applied per channel and averaged. MS-SSIM uses the
standard 5-scale weights.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(x: jax.Array, y: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-image PSNR over NHWC batches."""
    mse = jnp.mean(jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32)),
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array([
        math.exp(-((i - size // 2) ** 2) / (2 * sigma**2)) for i in range(size)
    ])
    return (g / g.sum()).astype(np.float32)


def _window_filter(x: jax.Array, taps: np.ndarray) -> jax.Array:
    """Separable VALID depthwise filtering over NHWC."""
    c = x.shape[-1]
    t = jnp.asarray(taps)
    for axis, shape in ((1, (-1, 1, 1, 1)), (2, (1, -1, 1, 1))):
        k = jnp.broadcast_to(t.reshape(shape), t.reshape(shape).shape[:2] + (1, c))
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            preferred_element_type=jnp.float32,
        )
    return x


def ssim(
    x: jax.Array,
    y: jax.Array,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    return_cs: bool = False,
):
    """Per-image SSIM over NHWC batches (channel-averaged)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    taps = _gaussian_kernel(window_size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _window_filter(x, taps)
    mu_y = _window_filter(y, taps)
    var_x = _window_filter(x * x, taps) - mu_x * mu_x
    var_y = _window_filter(y * y, taps) - mu_y * mu_y
    cov = _window_filter(x * y, taps) - mu_x * mu_y
    cs_map = (2 * cov + c2) / (var_x + var_y + c2)
    ssim_map = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs_map
    ssim_val = ssim_map.mean(axis=(1, 2, 3))
    if return_cs:
        return ssim_val, cs_map.mean(axis=(1, 2, 3))
    return ssim_val


def _downsample2(x: jax.Array) -> jax.Array:
    """2x average pooling (MS-SSIM scale step)."""
    n, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2]
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def ms_ssim(x: jax.Array, y: jax.Array, max_val: float = 1.0,
            weights=_MSSSIM_WEIGHTS) -> jax.Array:
    """Multi-scale SSIM (Wang 2003). Needs min side >= 11 * 2^(levels-1)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = len(weights)
    vals = []
    for i in range(levels):
        s, cs = ssim(x, y, max_val, return_cs=True)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            x = _downsample2(x)
            y = _downsample2(y)
    total = jnp.ones_like(vals[0])
    for v, w in zip(vals, weights):
        total = total * jnp.maximum(v, 0.0) ** w
    return total
