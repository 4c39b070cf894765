"""Windowed (local) statistics for ADISTS: Gaussian-weighted means,
variances and covariances over sliding windows.

Reference behavior: nerf_qa/ADISTS/ADISTS.py:66-69,102-110 (21x21 Gaussian
window, sigma=window/3, depthwise conv, stride 1, VALID padding — the
reference wraps inputs in ReflectionPad2d(0), i.e. no padding) and
:168-180 (windowed mean/var/cov with a global-stats fallback when the
window exceeds the feature map).

TPU design: the 2-D Gaussian window is separable, so each windowed moment
is two 1-D weighted sums. We express them as conv_general_dilated with a
(K,1,1,1)-shaped kernel broadcast over channels via feature_group_count —
XLA lowers stride-1 depthwise separable convs to efficient VPU code — in
float32 (the moments feed ratio statistics that are precision-sensitive).
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


def _conv1d_depthwise(x: jax.Array, taps: jax.Array, axis: int) -> jax.Array:
    """VALID 1-D depthwise conv along a spatial axis of NHWC x."""
    c = x.shape[-1]
    k = taps.reshape((-1, 1, 1, 1) if axis == 1 else (1, -1, 1, 1))
    k = jnp.broadcast_to(k, k.shape[:2] + (1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )


def window_mean(x: jax.Array, window_size: int = 21,
                sigma: float | None = None) -> jax.Array:
    """Gaussian windowed mean, VALID padding: (N,H,W,C) ->
    (N,H-K+1,W-K+1,C)."""
    if sigma is None:
        sigma = window_size / 3.0
    taps = jnp.asarray(gaussian_taps(window_size, sigma), jnp.float32)
    return _conv1d_depthwise(
        _conv1d_depthwise(x.astype(jnp.float32), taps, 1), taps, 2
    )


def fits_window(h: int, w: int, window_size: int = 21) -> bool:
    """Whether VALID windowed stats are defined for an HxW map. The
    reference discovers this via try/except around the conv
    (ADISTS.py:78-97); here it is an explicit static predicate (shapes
    are static under jit)."""
    return h >= window_size and w >= window_size
