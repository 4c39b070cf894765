"""Classical IQA metrics: PSNR, SSIM, MS-SSIM, LPIPS, GMSD (batched,
jittable).

The reference's prep/analysis compare DISTS against SSIM/PSNR/LPIPS/...
columns shipped inside its score CSVs (prep.py:344-394,
results_table*.tex competitor rows). Those columns came from external
tools; this module computes them natively so the full comparison
pipeline is self-contained.

SSIM follows Wang et al. 2004: 11x11 Gaussian window (sigma 1.5),
K1=0.01, K2=0.03, applied per channel and averaged. MS-SSIM uses the
standard 5-scale weights. LPIPS follows Zhang et al. 2018 (vgg variant):
scaling layer, MAX-pool VGG16 pyramid (relu{1_2,2_2,3_3,4_3,5_3}),
unit-normalized features, learned per-channel linear weights, spatial
mean, stage sum — the learned 1x1 ``lin`` weights convert from the
official lpips checkpoint (compat.pretrained.resolve_lpips_weights);
without a checkpoint they fall back to uniform 1/C with a warning
(structure-identical, calibration-meaningless).
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


_LPIPS_SHIFT = (-0.030, -0.088, -0.188)  # lpips ScalingLayer constants
_LPIPS_SCALE = (0.458, 0.448, 0.450)
LPIPS_STAGE_CHANNELS = (64, 128, 256, 512, 512)


def _lpips_pyramid(vgg_params, x: jax.Array) -> list[jax.Array]:
    """LPIPS's backbone: the STANDARD max-pool VGG16 (torchvision
    features), not DISTS's L2-pool variant — same conv params, 2x2 max
    pooling between stages."""
    from nerf_qa_tpu.core.vgg import _conv_relu

    h = (x.astype(jnp.float32) * 2.0 - 1.0
         - jnp.asarray(_LPIPS_SHIFT)) / jnp.asarray(_LPIPS_SCALE)
    feats = []
    for si in range(5):
        if si > 0:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )
        for layer in vgg_params[f"stage{si + 1}"]:
            h = _conv_relu(h, layer["kernel"], layer["bias"], jnp.float32)
        feats.append(h)
    return feats


def lpips(vgg_params, x: jax.Array, y: jax.Array,
          lin_weights=None) -> jax.Array:
    """Per-image LPIPS (vgg variant, Zhang et al. 2018) over NHWC [0,1]
    batches. ``lin_weights``: list of 5 per-channel (C_k,) arrays (the
    checkpoint's ``lin{k}.model.1.weight`` squeezed); None -> uniform
    1/C_k (uncalibrated)."""
    fx = _lpips_pyramid(vgg_params, x)
    fy = _lpips_pyramid(vgg_params, y)
    if lin_weights is None:
        lin_weights = [jnp.full((c,), 1.0 / c, jnp.float32)
                       for c in LPIPS_STAGE_CHANNELS]
    total = 0.0
    for fa, fb, w in zip(fx, fy, lin_weights):
        na = fa / jnp.sqrt(
            jnp.sum(jnp.square(fa), axis=-1, keepdims=True) + 1e-10)
        nb = fb / jnp.sqrt(
            jnp.sum(jnp.square(fb), axis=-1, keepdims=True) + 1e-10)
        d = jnp.square(na - nb)  # (N, H, W, C)
        total = total + jnp.mean(
            jnp.sum(d * jnp.asarray(w, jnp.float32), axis=-1), axis=(1, 2))
    return total


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


def gmsd(x: jax.Array, y: jax.Array) -> jax.Array:
    """Gradient Magnitude Similarity Deviation (Xue et al. 2014) — one of
    the competitor metrics in the reference's results tables
    (results_table.tex:11-20). Lower is worse quality. Per-image scores
    over NHWC [0,1] batches.

    Standard pipeline: luminance in [0,255], 2x2 average downsample,
    Prewitt gradients, GMS map with c=170, score = std(GMS)."""
    def lum255(v):
        v = v.astype(jnp.float32) * 255.0
        return (0.299 * v[..., 0] + 0.587 * v[..., 1]
                + 0.114 * v[..., 2])[..., None]

    x = lum255(x)
    y = lum255(y)
    # 2x2 average pooling, stride 2 (the paper's preprocessing)
    def down2(v):
        return jax.lax.reduce_window(
            v, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) * 0.25

    x = down2(x)
    y = down2(y)
    hx = jnp.asarray(
        [[1, 0, -1], [1, 0, -1], [1, 0, -1]], jnp.float32) / 3.0
    def grad_mag(v):
        def conv(k):
            return jax.lax.conv_general_dilated(
                v, k.reshape(3, 3, 1, 1), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
        gx = conv(hx)
        gy = conv(hx.T)
        return jnp.sqrt(gx * gx + gy * gy + 1e-12)

    gmx = grad_mag(x)
    gmy = grad_mag(y)
    c = 170.0
    gms = (2.0 * gmx * gmy + c) / (gmx * gmx + gmy * gmy + c)
    return jnp.std(gms, axis=(1, 2, 3))
