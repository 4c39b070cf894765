"""Windowed (local) statistics for ADISTS: Gaussian-weighted means,
variances and covariances over sliding windows.

Reference behavior: nerf_qa/ADISTS/ADISTS.py:66-69,102-110 (21x21 Gaussian
window, sigma=window/3, depthwise conv, stride 1, VALID padding — the
reference wraps inputs in ReflectionPad2d(0), i.e. no padding) and
:168-180 (windowed mean/var/cov with a global-stats fallback when the
window exceeds the feature map).

TPU design: the 2-D Gaussian window is separable, so each windowed moment
is two 1-D weighted sums, expressed as banded (out x in) matrices applied
with einsum — the MXU runs these far faster than stride-1 depthwise convs
on the VPU (the same formulation trick as ops/resize). Accumulation is
float32; parity mode uses HIGHEST matmul precision.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.cache
def gaussian_taps(window_size: int, sigma: float) -> tuple[float, ...]:
    """1-D normalized Gaussian (ADISTS.py:102-104)."""
    g = np.array([
        math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
        for x in range(window_size)
    ])
    return tuple(g / g.sum())


def _band_matrix(in_size: int, taps: tuple[float, ...]) -> np.ndarray:
    """(out, in) banded matrix applying a VALID 1-D window: row o holds
    the taps at columns o..o+K-1. Expressing the windowed sum as a dense
    matmul puts it on the MXU — stride-1 depthwise convs run on the VPU
    and are the ADISTS hot spot (same trick as ops/resize)."""
    k = len(taps)
    out_size = in_size - k + 1
    mat = np.zeros((out_size, in_size), np.float32)
    for i, t in enumerate(taps):
        mat[np.arange(out_size), np.arange(out_size) + i] = t
    return mat


def _window_axis(x: jax.Array, taps, axis: int,
                 precision: jax.lax.Precision) -> jax.Array:
    """VALID 1-D window along ``axis`` as ONE dense banded matmul.

    The dense (out, in) band matrix nominally wastes MXU FLOPs
    proportional to in/K (output row o only reads inputs o..o+K-1:
    12x at in=256, 51x at 1080) — but BLOCKED variants that cut the
    waste (output tiles with 128- or 256-wide input spans, slice-view
    einsums per block, static unroll) measured SLOWER on v5e in both
    regimes: 256² serving B=128 ADISTS stats 161 -> 227 ms (the output
    concat materializes fragments and breaks XLA's fusion of the
    downstream elementwise ops), and channel-blocked 1080p full-res
    7.8 vs 8.7 fr/s (with C=16 per scan step the matmuls are
    HBM-bound, so blocking only adds ~1.27x overlapped input reads +
    concat traffic). The band waste is free on the fat MXU; dense wins.
    """
    mat = jnp.asarray(_band_matrix(x.shape[axis], taps))
    eq = "oh,nhwc->nowc" if axis == 1 else "ow,nhwc->nhoc"
    return jnp.einsum(eq, mat, x, precision=precision,
                      preferred_element_type=jnp.float32)


def window_mean(x: jax.Array, window_size: int = 21,
                sigma: float | None = None,
                precision: jax.lax.Precision | None = None,
                out_dtype: jnp.dtype | None = None) -> jax.Array:
    """Gaussian windowed mean, VALID padding: (N,H,W,C) ->
    (N,H-K+1,W-K+1,C). Two banded matmuls (separable window) on the MXU;
    fp32 inputs default to HIGHEST precision (parity), bf16 to DEFAULT.

    ``out_dtype`` sets the dtype of the inter-pass intermediate AND the
    output (accumulation inside each matmul stays fp32). The windowed
    maps are HBM-bound at batch scale — bf16 halves their traffic; use
    only where the caller tolerates ~0.4% relative rounding (serving).
    """
    if sigma is None:
        sigma = window_size / 3.0
    if precision is None:
        precision = (
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    taps = gaussian_taps(window_size, sigma)
    y = _window_axis(x, taps, 1, precision)
    if out_dtype is not None:
        y = y.astype(out_dtype)
    y = _window_axis(y, taps, 2, precision)
    if out_dtype is not None:
        y = y.astype(out_dtype)
    return y


def fits_window(h: int, w: int, window_size: int = 21) -> bool:
    """Whether VALID windowed stats are defined for an HxW map. The
    reference discovers this via try/except around the conv
    (ADISTS.py:78-97); here it is an explicit static predicate (shapes
    are static under jit)."""
    return h >= window_size and w >= window_size
