"""Classical IQA metrics: PSNR, SSIM, MS-SSIM, LPIPS, GMSD, VIF,
FSIM/FSIMc, NLPD, MAD (batched, jittable).

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
    """Separable VALID depthwise filtering over NHWC.

    Precision.HIGHEST is load-bearing: TPU convs default to bf16-grade
    operand precision even for f32 inputs, and the W(x²)−W(x)² variances
    these moments feed cancel catastrophically — bf16 operands produce
    ~1e-3 NEGATIVE variances whose near-zero SSIM denominators blow
    single windows up to >1e4 (observed: frame SSIM 1.05 on the
    synthetic fixture)."""
    c = x.shape[-1]
    t = jnp.asarray(taps)
    for axis, shape in ((1, (-1, 1, 1, 1)), (2, (1, -1, 1, 1))):
        k = jnp.broadcast_to(t.reshape(shape), t.reshape(shape).shape[:2] + (1, c))
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
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


def _lpips_score(fx, fy, lin_weights) -> jax.Array:
    """Stage-summed LPIPS distance between two feature pyramids:
    unit-normalize channels, weighted squared diff, spatial mean."""
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


def lpips(vgg_params, x: jax.Array, y: jax.Array,
          lin_weights=None) -> jax.Array:
    """Per-image LPIPS (vgg variant, Zhang et al. 2018) over NHWC [0,1]
    batches. ``lin_weights``: list of 5 per-channel (C_k,) arrays (the
    checkpoint's ``lin{k}.model.1.weight`` squeezed); None -> uniform
    1/C_k (uncalibrated)."""
    return _lpips_score(_lpips_pyramid(vgg_params, x),
                        _lpips_pyramid(vgg_params, y), lin_weights)


def _max_blur_pool(h: jax.Array) -> jax.Array:
    """Anti-aliased downsampling (Zhang 2019 MaxBlurPool): 2x2 max-pool
    at stride 1, then a [1 2 1] tent blur with reflect padding at
    stride 2 — the shift-invariant replacement for strided max-pool."""
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1), "VALID",
    )
    taps = np.asarray([1.0, 2.0, 1.0], np.float32) / 4.0
    c = h.shape[-1]
    for axis, shape in ((1, (-1, 1, 1, 1)), (2, (1, -1, 1, 1))):
        t = jnp.asarray(taps).reshape(shape)
        k = jnp.broadcast_to(t, t.shape[:2] + (1, c))
        pad = [(0, 0), (0, 0)]
        pad[axis - 1] = (1, 1)
        h = jnp.pad(
            h, ((0, 0), pad[0], pad[1], (0, 0)), mode="reflect")
        strides = (2, 1) if axis == 1 else (1, 2)
        h = jax.lax.conv_general_dilated(
            h, k, strides, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return h


def _st_lpips_pyramid(vgg_params, x: jax.Array) -> list[jax.Array]:
    """ST-LPIPS backbone: the LPIPS VGG16 pyramid with every strided
    max-pool replaced by an anti-aliased MaxBlurPool."""
    from nerf_qa_tpu.core.vgg import _conv_relu

    h = (x.astype(jnp.float32) * 2.0 - 1.0
         - jnp.asarray(_LPIPS_SHIFT)) / jnp.asarray(_LPIPS_SCALE)
    feats = []
    for si in range(5):
        if si > 0:
            h = _max_blur_pool(h)
        for layer in vgg_params[f"stage{si + 1}"]:
            h = _conv_relu(h, layer["kernel"], layer["bias"], jnp.float32)
        feats.append(h)
    return feats


def st_lpips(vgg_params, x: jax.Array, y: jax.Array,
             lin_weights=None) -> jax.Array:
    """Per-image shift-tolerant LPIPS (Ghildyal & Liu, ECCV 2022) over
    NHWC [0,1] batches — a competitor row of the reference's Test2
    results table (results_table_test2.tex:11-25) the reference consumed
    from external CSVs.

    Follows the paper's central architectural change: LPIPS'
    downsampling is made shift-invariant by swapping each strided
    max-pool for an anti-aliased MaxBlurPool (2x2 max at stride 1 +
    reflect-padded [1 2 1] tent blur at stride 2), which removes the
    aliasing that makes vanilla LPIPS jump under 1-px shifts. The
    official checkpoints' ``lin`` weights (trained on shifted pairs)
    convert through the same layout as LPIPS
    (compat.torch_weights.convert_lpips_lin, $NERF_QA_STLPIPS_CKPT);
    None -> uniform 1/C_k (uncalibrated but structure-identical)."""
    return _lpips_score(_st_lpips_pyramid(vgg_params, x),
                        _st_lpips_pyramid(vgg_params, y), lin_weights)


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


def _lum255(v: jax.Array) -> jax.Array:
    """NHWC [0,1] -> NHW luminance in [0,255] (ITU-R BT.601 weights)."""
    v = v.astype(jnp.float32) * 255.0
    return 0.299 * v[..., 0] + 0.587 * v[..., 1] + 0.114 * v[..., 2]


def _filter2_valid(x: jax.Array, win: np.ndarray) -> jax.Array:
    """Dense VALID 2-D correlation over an NHW batch (f32 operand
    precision — VIF's variances cancel like SSIM's, see _window_filter)."""
    k = jnp.asarray(win, jnp.float32)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x[..., None], k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[..., 0]


def vif(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pixel-domain Visual Information Fidelity (Sheikh & Bovik 2006,
    the ``vifp_mscale`` formulation) — a competitor metric in the
    reference's Test2 results table (results_table_test2.tex:11-25).
    Per-image scores over NHWC [0,1] batches; ``x`` is the reference
    image, ``y`` the distorted one. Higher is better; 1.0 for identical
    inputs, and >1 is possible for contrast-enhanced ``y`` (a known VIF
    property). Degenerate (constant, zero-information) reference images
    return 0.0 by convention where the canonical vifp_mscale divides
    0/0 into NaN — downstream aggregation treats them as
    no-fidelity frames rather than poisoning video means.

    Algorithm: 4 scales; at scale s a Gaussian window of size
    N=2^(5-s)+1 (std N/5) computes local moments on luminance [0,255];
    between scales the images are low-passed and 2x subsampled. Scalar
    visual-information ratio accumulates log10 terms with
    sigma_nsq=2."""
    ref = _lum255(x)
    dist = _lum255(y)
    sigma_nsq = 2.0
    num = 0.0
    den = 0.0
    for scale in range(1, 5):
        n = 2 ** (4 - scale + 1) + 1
        taps = _gaussian_kernel(n, n / 5.0).astype(np.float64)
        win = np.outer(taps, taps)
        win = (win / win.sum()).astype(np.float32)
        if scale > 1:
            ref = _filter2_valid(ref, win)[:, ::2, ::2]
            dist = _filter2_valid(dist, win)[:, ::2, ::2]
        mu1 = _filter2_valid(ref, win)
        mu2 = _filter2_valid(dist, win)
        sigma1_sq = _filter2_valid(ref * ref, win) - mu1 * mu1
        sigma2_sq = _filter2_valid(dist * dist, win) - mu2 * mu2
        sigma12 = _filter2_valid(ref * dist, win) - mu1 * mu2
        sigma1_sq = jnp.maximum(sigma1_sq, 0.0)
        sigma2_sq = jnp.maximum(sigma2_sq, 0.0)

        g = sigma12 / (sigma1_sq + 1e-10)
        sv_sq = sigma2_sq - g * sigma12
        # the reference MATLAB's edge-case rewrites, as masks
        tiny1 = sigma1_sq < 1e-10
        g = jnp.where(tiny1, 0.0, g)
        sv_sq = jnp.where(tiny1, sigma2_sq, sv_sq)
        sigma1_sq = jnp.where(tiny1, 0.0, sigma1_sq)
        tiny2 = sigma2_sq < 1e-10
        g = jnp.where(tiny2, 0.0, g)
        sv_sq = jnp.where(tiny2, 0.0, sv_sq)
        neg_g = g < 0
        sv_sq = jnp.where(neg_g, sigma2_sq, sv_sq)
        g = jnp.where(neg_g, 0.0, g)
        sv_sq = jnp.maximum(sv_sq, 1e-10)

        num = num + jnp.sum(
            jnp.log10(1.0 + g * g * sigma1_sq / (sv_sq + sigma_nsq)),
            axis=(1, 2),
        )
        den = den + jnp.sum(
            jnp.log10(1.0 + sigma1_sq / sigma_nsq), axis=(1, 2)
        )
    return num / jnp.maximum(den, 1e-10)


def gmsd(x: jax.Array, y: jax.Array) -> jax.Array:
    """Gradient Magnitude Similarity Deviation (Xue et al. 2014) — one of
    the competitor metrics in the reference's results tables
    (results_table.tex:11-20). Lower is worse quality. Per-image scores
    over NHWC [0,1] batches.

    Standard pipeline: luminance in [0,255], 2x2 average downsample,
    Prewitt gradients, GMS map with c=170, score = std(GMS)."""
    x = _lum255(x)[..., None]
    y = _lum255(y)[..., None]
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
                precision=jax.lax.Precision.HIGHEST,
            )
        gx = conv(hx)
        gy = conv(hx.T)
        return jnp.sqrt(gx * gx + gy * gy + 1e-12)

    gmx = grad_mag(x)
    gmy = grad_mag(y)
    c = 170.0
    gms = (2.0 * gmx * gmy + c) / (gmx * gmx + gmy * gmy + c)
    return jnp.std(gms, axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# FSIM / FSIMc (Zhang et al. 2011) — competitor metric in the reference's
# Test2 results table (results_table_test2.tex:11-25). The phase-congruency
# transform follows the FSIM authors' embedding of Kovesi's phasecong2
# (4 log-Gabor scales x 4 orientations, minWaveLength 6, mult 2,
# sigmaOnf 0.55, dThetaOnSigma 1.2, noise threshold k=2 with the /1.7
# empirical rescale). All frequency-domain filters are numpy constants
# built at trace time (static shapes); only the image FFTs are traced.
# ---------------------------------------------------------------------------

_PC_NSCALE = 4
_PC_NORIENT = 4
_PC_MIN_WAVELENGTH = 6.0
_PC_MULT = 2.0
_PC_SIGMA_ONF = 0.55
_PC_DTHETA_ON_SIGMA = 1.2
_PC_K = 2.0
_PC_EPS = 1e-4


def _pc_filters(rows: int, cols: int):
    """(filters[o][s] (H,W) float32, noise constants) for phasecong2."""
    if cols % 2:
        xr = np.arange(-(cols - 1) / 2, (cols - 1) / 2 + 1) / (cols - 1)
    else:
        xr = np.arange(-cols / 2, cols / 2) / cols
    if rows % 2:
        yr = np.arange(-(rows - 1) / 2, (rows - 1) / 2 + 1) / (rows - 1)
    else:
        yr = np.arange(-rows / 2, rows / 2) / rows
    xg, yg = np.meshgrid(xr, yr)
    radius = np.fft.ifftshift(np.sqrt(xg * xg + yg * yg))
    radius[0, 0] = 1.0
    theta = np.fft.ifftshift(np.arctan2(-yg, xg))
    sintheta, costheta = np.sin(theta), np.cos(theta)

    lp = np.fft.ifftshift(  # Kovesi lowpassfilter(cutoff=.45, n=15)
        1.0 / (1.0 + (np.fft.fftshift(radius) / 0.45) ** 30))
    log_gabor = []
    for s in range(_PC_NSCALE):
        fo = 1.0 / (_PC_MIN_WAVELENGTH * _PC_MULT**s)
        g = np.exp(-np.log(radius / fo) ** 2
                   / (2.0 * np.log(_PC_SIGMA_ONF) ** 2)) * lp
        g[0, 0] = 0.0
        log_gabor.append(g)

    theta_sigma = np.pi / _PC_NORIENT / _PC_DTHETA_ON_SIGMA
    spreads = []
    for o in range(_PC_NORIENT):
        angl = o * np.pi / _PC_NORIENT
        ds = sintheta * np.cos(angl) - costheta * np.sin(angl)
        dc = costheta * np.cos(angl) + sintheta * np.sin(angl)
        dtheta = np.abs(np.arctan2(ds, dc))
        spreads.append(np.exp(-dtheta**2 / (2.0 * theta_sigma**2)))

    filters = [[(log_gabor[s] * spreads[o]).astype(np.float32)
                for s in range(_PC_NSCALE)] for o in range(_PC_NORIENT)]

    # per-orientation noise-model constants (data enters only through the
    # median of the smallest-scale energy)
    noise_const = []
    for o in range(_PC_NORIENT):
        em_n = float(np.sum(filters[o][0] ** 2))
        ifft_filts = [
            np.real(np.fft.ifft2(filters[o][s])) * np.sqrt(rows * cols)
            for s in range(_PC_NSCALE)
        ]
        sum_an2 = float(sum(np.sum(f * f) for f in ifft_filts))
        sum_aiaj = float(sum(
            np.sum(ifft_filts[si] * ifft_filts[sj])
            for si in range(_PC_NSCALE) for sj in range(si + 1, _PC_NSCALE)
        ))
        noise_const.append((em_n, sum_an2, sum_aiaj))
    return filters, noise_const


def _phase_congruency(im: jax.Array) -> jax.Array:
    """Kovesi phasecong2 map over an NHW luminance batch (per FSIM.m)."""
    n, rows, cols = im.shape
    filters, noise_const = _pc_filters(rows, cols)
    imfft = jnp.fft.fft2(im.astype(jnp.float32))

    energy_all = 0.0
    an_all = 0.0
    for o in range(_PC_NORIENT):
        eos = []
        sum_an = 0.0
        sum_e = 0.0
        sum_o = 0.0
        for s in range(_PC_NSCALE):
            eo = jnp.fft.ifft2(imfft * jnp.asarray(filters[o][s]))
            eos.append(eo)
            sum_an = sum_an + jnp.abs(eo)
            sum_e = sum_e + jnp.real(eo)
            sum_o = sum_o + jnp.imag(eo)
        x_energy = jnp.sqrt(sum_e**2 + sum_o**2) + _PC_EPS
        mean_e = sum_e / x_energy
        mean_o = sum_o / x_energy
        energy = 0.0
        for eo in eos:
            e, oi = jnp.real(eo), jnp.imag(eo)
            energy = energy + e * mean_e + oi * mean_o - jnp.abs(
                e * mean_o - oi * mean_e)

        em_n, sum_an2, sum_aiaj = noise_const[o]
        median_e2n = jnp.median(
            jnp.abs(eos[0]) ** 2, axis=(1, 2), keepdims=True)
        mean_e2n = median_e2n / float(np.log(2.0))
        noise_power = mean_e2n / em_n
        est_noise_energy2 = (2.0 * noise_power * sum_an2
                             + 4.0 * noise_power * sum_aiaj)
        tau = jnp.sqrt(est_noise_energy2 / 2.0)
        est_mean = tau * float(np.sqrt(np.pi / 2.0))
        est_sigma = jnp.sqrt((2.0 - np.pi / 2.0) * tau**2)
        t = (est_mean + _PC_K * est_sigma) / 1.7  # FSIM.m empirical rescale
        energy = jnp.maximum(energy - t, 0.0)

        energy_all = energy_all + energy
        an_all = an_all + sum_an
    return energy_all / an_all


def _scharr_grad(v: jax.Array) -> jax.Array:
    """Gradient magnitude with FSIM.m's Scharr/16 operator over NHW."""
    kx = jnp.asarray(
        [[3.0, 0.0, -3.0], [10.0, 0.0, -10.0], [3.0, 0.0, -3.0]],
        jnp.float32) / 16.0

    def conv(k):
        return jax.lax.conv_general_dilated(
            v[..., None], k.reshape(3, 3, 1, 1), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[..., 0]

    gx = conv(kx)
    gy = conv(kx.T)
    return jnp.sqrt(gx * gx + gy * gy)


def _fsim_impl(x: jax.Array, y: jax.Array):
    """Shared FSIM/FSIMc pipeline; returns (fsim, fsimc) per image."""
    x = x.astype(jnp.float32) * 255.0
    y = y.astype(jnp.float32) * 255.0

    def yiq(v):
        return (
            0.299 * v[..., 0] + 0.587 * v[..., 1] + 0.114 * v[..., 2],
            0.596 * v[..., 0] - 0.274 * v[..., 1] - 0.322 * v[..., 2],
            0.211 * v[..., 0] - 0.523 * v[..., 1] + 0.312 * v[..., 2],
        )

    y1, i1, q1 = yiq(x)
    y2, i2, q2 = yiq(y)

    rows, cols = y1.shape[1], y1.shape[2]
    # MATLAB round() is half-away-from-zero; Python's round() banker's-
    # rounds .5 boundaries down (640-px min side: F=3 in FSIM.m, not 2)
    f = max(1, int(np.floor(min(rows, cols) / 256.0 + 0.5)))
    if f > 1:
        ave = np.full((f, f), 1.0 / (f * f), np.float32)

        def down(v):
            # 'same' average filter then 1:F subsampling (FSIM.m order)
            pad_t = (f - 1) // 2
            pad_l = (f - 1) // 2
            vf = jax.lax.conv_general_dilated(
                v[..., None], jnp.asarray(ave).reshape(f, f, 1, 1),
                (1, 1), [(pad_t, f - 1 - pad_t), (pad_l, f - 1 - pad_l)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[..., 0]
            return vf[:, ::f, ::f]

        y1, i1, q1, y2, i2, q2 = (down(v) for v in (y1, i1, q1, y2, i2, q2))

    pc1 = _phase_congruency(y1)
    pc2 = _phase_congruency(y2)
    g1 = _scharr_grad(y1)
    g2 = _scharr_grad(y2)

    t1, t2, t3, t4, lam = 0.85, 160.0, 200.0, 200.0, 0.03
    s_pc = (2.0 * pc1 * pc2 + t1) / (pc1**2 + pc2**2 + t1)
    s_g = (2.0 * g1 * g2 + t2) / (g1**2 + g2**2 + t2)
    pcm = jnp.maximum(pc1, pc2)
    sim = s_g * s_pc * pcm
    denom = jnp.sum(pcm, axis=(1, 2))
    fsim_val = jnp.sum(sim, axis=(1, 2)) / denom

    s_i = (2.0 * i1 * i2 + t3) / (i1**2 + i2**2 + t3)
    s_q = (2.0 * q1 * q2 + t4) / (q1**2 + q2**2 + t4)
    # FSIM.m uses real((S_I*S_Q)^lambda): for negative products MATLAB's
    # complex power yields |s|^lam * cos(lam*pi), not a sign flip
    siq = s_i * s_q
    chroma = jnp.abs(siq) ** lam * jnp.where(
        siq < 0, float(np.cos(lam * np.pi)), 1.0)
    fsimc_val = jnp.sum(sim * chroma, axis=(1, 2)) / denom
    return fsim_val, fsimc_val


def fsim(x: jax.Array, y: jax.Array) -> jax.Array:
    """FSIM (luma) per-image scores over NHWC [0,1] batches."""
    return _fsim_impl(x, y)[0]


def fsimc(x: jax.Array, y: jax.Array) -> jax.Array:
    """FSIMc (luma + IQ chrominance) per-image scores."""
    return _fsim_impl(x, y)[1]


# ---------------------------------------------------------------------------
# NLPD (Laparra, Ballé, Berardino & Simoncelli 2016) — the remaining
# classical competitor row of the reference's results tables
# (results_table.tex NLPD column). Normalized Laplacian pyramid distance:
# a 6-level Laplacian pyramid (Burt-Adelson a=0.4 five-tap) on luminance,
# each subband divisively normalized by a 3x3 local-amplitude filter plus
# a per-scale sigma (the authors' released DN_filters constants,
# transcribed below), distance = mean over subbands of per-band RMSE.
# Lower is better; 0 for identical inputs.
# ---------------------------------------------------------------------------

_NLPD_LAP_TAPS = np.asarray([0.05, 0.25, 0.4, 0.25, 0.05], np.float32)
_NLPD_SIGMAS = (0.0248, 0.0185, 0.0179, 0.0191, 0.0220, 0.2782)
_NLPD_DN_FILTS = tuple(
    np.asarray([[0.0, a, 0.0], [b, 0.0, c], [0.0, d, 0.0]], np.float32)
    for a, b, c, d in (
        (0.1011, 0.1493, 0.1460, 0.1015),
        (0.0757, 0.1986, 0.1846, 0.0837),
        (0.0477, 0.2138, 0.2243, 0.0467),
        (0.0555, 0.2116, 0.2123, 0.0514),
        (0.0078, 0.2350, 0.2400, 0.0328),
        (0.0018, 0.2520, 0.2541, 0.0004),
    )
)


def _nlpd_conv(x: jax.Array, k2d, pad: int, stride: int = 1) -> jax.Array:
    """Reflect-padded dense 2-D correlation over an NHW batch."""
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    k = jnp.asarray(k2d, jnp.float32)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        xp[..., None], k, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[..., 0]


def _nlpd_up(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Zero-stuffed 2x upsample + 4*filt interpolation (NHW), cropped to
    (out_h, out_w) so odd parent sizes round-trip."""
    k = np.outer(_NLPD_LAP_TAPS, _NLPD_LAP_TAPS) * 4.0
    y = jax.lax.conv_general_dilated(
        x[..., None], jnp.asarray(k, jnp.float32)[:, :, None, None],
        (1, 1), [(2, 3), (2, 3)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[..., 0]
    return y[:, :out_h, :out_w]


def _nlpd_pyramid(im: jax.Array, levels: int) -> list[jax.Array]:
    """Normalized Laplacian subbands of an NHW luminance batch."""
    lap_k = np.outer(_NLPD_LAP_TAPS, _NLPD_LAP_TAPS)
    bands = []
    for i in range(levels - 1):
        down = _nlpd_conv(im, lap_k, pad=2, stride=2)
        up = _nlpd_up(down, im.shape[1], im.shape[2])
        lap = im - up
        den = _nlpd_conv(jnp.abs(lap), _NLPD_DN_FILTS[i], pad=1)
        bands.append(lap / (den + _NLPD_SIGMAS[i]))
        im = down
    den = _nlpd_conv(jnp.abs(im), _NLPD_DN_FILTS[levels - 1], pad=1)
    bands.append(im / (den + _NLPD_SIGMAS[levels - 1]))
    return bands


def nlpd_max_levels(h: int, w: int, cap: int = 6) -> int:
    """Deepest NLPD pyramid the (h, w) frame supports: min side must
    stay >= 3 at every level for the 5-tap reflect pad (callers with
    variable frame sizes — prep_fr's aspect/full_size policies — clamp
    with this instead of raising inside jit)."""
    return max(1, min(cap, int(math.floor(math.log2(min(h, w) / 3.0))) + 1))


def nlpd(x: jax.Array, y: jax.Array, levels: int = 6) -> jax.Array:
    """Per-image NLPD over NHWC [0,1] batches (lower is better). Needs
    min side >= 3 * 2^(levels-1) so the deepest level still fits the
    5-tap reflect pad; pass a smaller ``levels`` for tiny images
    (``nlpd_max_levels``)."""
    p1 = _nlpd_pyramid(_lum255(x) / 255.0, levels)
    p2 = _nlpd_pyramid(_lum255(y) / 255.0, levels)
    dist = 0.0
    for a, b in zip(p1, p2):
        dist = dist + jnp.sqrt(
            jnp.mean(jnp.square(a - b), axis=(1, 2)) + 1e-12)
    return dist / float(levels)


# ---------------------------------------------------------------------------
# MAD (Larson & Chandler 2010, "Most apparent distortion") — the last
# classical (constant-only, no learned weights) competitor row of the
# reference's Test2 results table (results_table_test2.tex:13). Two
# strategies combined adaptively:
#   * detection (hi-quality) index: perceived luminance (k*I)^(2.2/3),
#     Mannos–Sakrison-style CSF in the frequency domain, then visible
#     local MSE gated by an RMS-contrast masking model over 16x16
#     blocks (stride 4; reference block std = min of the four 8x8
#     sub-block stds so edges don't over-mask);
#   * appearance (lo-quality) index: a 5-scale x 4-orientation
#     log-Gabor decomposition (Kovesi gaborconvolve constants:
#     minWaveLength 3, mult 3, sigmaOnf 0.55, dThetaOnSigma 1.5) whose
#     magnitudes are compared by blockwise std/skewness/kurtosis
#     differences with scale weights [0.5 0.75 1 5 6]/13.25.
# Final score = d_detect^a * d_appear^(1-a), a = 1/(1 + b1*d_detect^b2),
# b1=0.467, b2=0.130. 0 for identical images; higher = worse quality.
# Block maps use VALID windows (no boundary blocks), which replaces the
# original's border-block zeroing.
# ---------------------------------------------------------------------------

_MAD_BLOCK = 16
_MAD_STRIDE = 4
_MAD_BETA1 = 0.467
_MAD_BETA2 = 0.130
_MAD_GABOR_WEIGHTS = np.asarray([0.5, 0.75, 1.0, 5.0, 6.0], np.float32)
_MAD_GABOR_WEIGHTS /= _MAD_GABOR_WEIGHTS.sum()


def _mad_csf(rows: int, cols: int) -> np.ndarray:
    """Frequency-domain CSF (ifftshift layout): Mannos–Sakrison curve
    with the oblique effect, 32 cycles/degree across the image, and the
    original's low-frequency plateau 0.9809 below 7.8909 cyc/deg."""
    nfreq = 32.0
    u = np.arange(-(cols - 1) / 2.0, (cols + 1) / 2.0) / cols * 2 * nfreq
    v = np.arange(-(rows - 1) / 2.0, (rows + 1) / 2.0) / rows * 2 * nfreq
    ug, vg = np.meshgrid(u, v)
    radfreq = np.sqrt(ug * ug + vg * vg)
    w = 0.7
    s = (1 - w) / 2 * np.cos(4 * np.arctan2(vg, ug)) + (1 + w) / 2
    radfreq = radfreq / s
    csf = 2.6 * (0.0192 + 0.114 * radfreq) * np.exp(-((0.114 * radfreq) ** 1.1))
    csf[radfreq < 7.8909] = 0.9809
    return np.fft.ifftshift(csf).astype(np.float32)


def _mad_window_mean(v: jax.Array, block: int, stride: int) -> jax.Array:
    """Blockwise mean over an NHW batch (VALID windows)."""
    return jax.lax.reduce_window(
        v, 0.0, jax.lax.add, (1, block, block), (1, stride, stride), "VALID"
    ) / float(block * block)


def _mad_window_std(v: jax.Array, block: int, stride: int) -> jax.Array:
    m1 = _mad_window_mean(v, block, stride)
    m2 = _mad_window_mean(v * v, block, stride)
    return jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0))


def _mad_min_subblock_std(v: jax.Array) -> jax.Array:
    """Per 16x16 stride-4 block: min std over its four 8x8 sub-blocks."""
    s8 = _mad_window_std(v, _MAD_BLOCK // 2, _MAD_STRIDE)
    # 16x16 block at window index q covers 8x8 windows {q, q+2}^2
    n, h8, w8 = s8.shape
    h16, w16 = h8 - 2, w8 - 2
    out = s8[:, :h16, :w16]
    for di, dj in ((0, 2), (2, 0), (2, 2)):
        out = jnp.minimum(out, s8[:, di:di + h16, dj:dj + w16])
    return out


def _mad_detect(ref_lum: jax.Array, dst_lum: jax.Array) -> jax.Array:
    """Detection-stage index over NHW [0,255] luminance batches."""
    k = 0.02874
    g_thr = 0.5
    c_slope, ci_thr, cd_thr = 1.0, -5.0, -5.0
    n, rows, cols = ref_lum.shape
    csf = jnp.asarray(_mad_csf(rows, cols))

    def perceived(v):
        lum = (k * jnp.maximum(v, 0.0) + 1e-12) ** (2.2 / 3.0)
        return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(lum) * csf))

    ref = perceived(ref_lum)
    dst = perceived(dst_lum)
    err = ref - dst

    mean_ref = _mad_window_mean(ref, _MAD_BLOCK, _MAD_STRIDE)
    std_err = _mad_window_std(err, _MAD_BLOCK, _MAD_STRIDE)
    std_ref = _mad_min_subblock_std(ref)

    lit = mean_ref > g_thr
    safe_mean = jnp.where(lit, mean_ref, 1.0)
    ci_ref = jnp.where(
        lit, jnp.log(jnp.maximum(std_ref, 1e-12) / safe_mean), -999.0)
    ci_err = jnp.where(
        lit, jnp.log(jnp.maximum(std_err, 1e-12) / safe_mean), -999.0)

    msk = jnp.where(
        ci_ref > ci_thr,
        jnp.maximum(ci_err - (c_slope * (ci_ref - ci_thr) + cd_thr), 0.0),
        jnp.maximum(ci_err - ci_thr, 0.0),
    )
    lmse = _mad_window_mean(err * err, _MAD_BLOCK, _MAD_STRIDE)
    mp = msk * lmse
    return jnp.sqrt(jnp.mean(jnp.square(mp), axis=(1, 2)) + 1e-24) * 200.0


def _mad_gabor_filters(rows: int, cols: int) -> list[list[np.ndarray]]:
    """Kovesi gaborconvolve log-Gabor bank (ifftshift layout), 5 scales
    x 4 orientations, minWaveLength 3, mult 3, sigmaOnf 0.55,
    dThetaOnSigma 1.5."""
    nscale, norient = 5, 4
    min_wl, mult, sigma_onf, dtheta_on_sigma = 3.0, 3.0, 0.55, 1.5
    if cols % 2:
        xr = np.arange(-(cols - 1) / 2, (cols - 1) / 2 + 1) / (cols - 1)
    else:
        xr = np.arange(-cols / 2, cols / 2) / cols
    if rows % 2:
        yr = np.arange(-(rows - 1) / 2, (rows - 1) / 2 + 1) / (rows - 1)
    else:
        yr = np.arange(-rows / 2, rows / 2) / rows
    xg, yg = np.meshgrid(xr, yr)
    radius = np.fft.ifftshift(np.sqrt(xg * xg + yg * yg))
    radius[0, 0] = 1.0
    theta = np.fft.ifftshift(np.arctan2(-yg, xg))
    sintheta, costheta = np.sin(theta), np.cos(theta)
    theta_sigma = np.pi / norient / dtheta_on_sigma

    radial = []
    for s in range(nscale):
        fo = 1.0 / (min_wl * mult**s)
        g = np.exp(-np.log(radius / fo) ** 2 / (2.0 * np.log(sigma_onf) ** 2))
        g[0, 0] = 0.0
        radial.append(g)
    banks = []
    for o in range(norient):
        angl = o * np.pi / norient
        ds = sintheta * np.cos(angl) - costheta * np.sin(angl)
        dc = costheta * np.cos(angl) + sintheta * np.sin(angl)
        spread = np.exp(-np.arctan2(np.abs(ds), dc) ** 2
                        / (2.0 * theta_sigma**2))
        banks.append([(radial[s] * spread).astype(np.float32)
                      for s in range(nscale)])
    return banks


def _mad_block_stats(v: jax.Array):
    """Blockwise (16x16 stride 4) std, skewness, kurtosis of an NHW
    batch. The image's global mean is subtracted first (central moments
    are shift-invariant; this tames the fp32 cancellation in the raw
    third/fourth moments)."""
    v = v - jnp.mean(v, axis=(1, 2), keepdims=True)
    m1 = _mad_window_mean(v, _MAD_BLOCK, _MAD_STRIDE)
    m2 = _mad_window_mean(v * v, _MAD_BLOCK, _MAD_STRIDE)
    m3 = _mad_window_mean(v * v * v, _MAD_BLOCK, _MAD_STRIDE)
    m4 = _mad_window_mean(v * v * v * v, _MAD_BLOCK, _MAD_STRIDE)
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    m3c = m3 - 3.0 * m1 * m2 + 2.0 * m1**3
    m4c = m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1**4
    ok = var > 1e-12
    safe = jnp.where(ok, var, 1.0)
    std = jnp.sqrt(var)
    skw = jnp.where(ok, m3c / safe**1.5, 0.0)
    krt = jnp.where(ok, m4c / (safe * safe), 0.0)
    return std, skw, krt


def _mad_appear(ref_lum: jax.Array, dst_lum: jax.Array) -> jax.Array:
    """Appearance-stage index over NHW [0,255] luminance batches."""
    n, rows, cols = ref_lum.shape
    banks = _mad_gabor_filters(rows, cols)
    fref = jnp.fft.fft2(ref_lum.astype(jnp.float32))
    fdst = jnp.fft.fft2(dst_lum.astype(jnp.float32))
    eta = 0.0
    for bank in banks:
        for s, filt in enumerate(bank):
            fj = jnp.asarray(filt)
            mag_r = jnp.abs(jnp.fft.ifft2(fref * fj))
            mag_d = jnp.abs(jnp.fft.ifft2(fdst * fj))
            std_r, skw_r, krt_r = _mad_block_stats(mag_r)
            std_d, skw_d, krt_d = _mad_block_stats(mag_d)
            eta = eta + float(_MAD_GABOR_WEIGHTS[s]) * (
                jnp.abs(std_r - std_d) + 2.0 * jnp.abs(skw_r - skw_d)
                + jnp.abs(krt_r - krt_d))
    return jnp.sqrt(jnp.mean(jnp.square(eta), axis=(1, 2)) + 1e-24)


def mad(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-image MAD over NHWC [0,1] batches; ``x`` is the reference.
    Higher is worse; 0 for identical inputs. Needs min side >= 16."""
    ref = _lum255(x)
    dst = _lum255(y)
    d_detect = _mad_detect(ref, dst)
    d_appear = _mad_appear(ref, dst)
    alpha = 1.0 / (1.0 + _MAD_BETA1 * jnp.maximum(d_detect, 1e-12)
                   ** _MAD_BETA2)
    return (jnp.maximum(d_detect, 0.0) ** alpha
            * jnp.maximum(d_appear, 0.0) ** (1.0 - alpha))
