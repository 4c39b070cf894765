"""Anti-aliased L2 pooling (hann-window energy pooling).

Reference behavior: nerf_qa/DISTS_pytorch/DISTS_pt.py:11-25 (``L2pooling``)
and its duplicate nerf_qa/ADISTS/ADISTS.py:16-31 (``Downsample``): square the
input, depthwise-convolve with a normalized 3x3 Hann window (hanning(5)
minus endpoints), stride 2, padding 1, then sqrt(.+1e-12).

TPU design notes
----------------
* NHWC layout throughout (TPU-native; channels on the 128-lane axis).
* The window is identical for every channel and separable
  (outer(a, a) with a = [0.5, 1.0, 0.5] / norm), so instead of a depthwise
  conv (which maps poorly onto the MXU) we run two tiny 1-D convolutions
  expressed as strided slices + weighted adds on the VPU. XLA fuses the
  whole op (square -> pool -> sqrt) into one elementwise+reduce pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.cache
def hann_window_1d(filter_size: int = 5) -> tuple[float, ...]:
    """1-D hann tap vector: np.hanning(filter_size)[1:-1], un-normalized."""
    return tuple(float(v) for v in np.hanning(filter_size)[1:-1])


def l2pool(x: jax.Array, *, filter_size: int = 5, stride: int = 2) -> jax.Array:
    """L2 pooling over an NHWC tensor.

    Matches ``L2pooling(filter_size=5, stride=2)``: 3x3 normalized hann
    window, stride 2, padding (filter_size-2)//2 = 1, on x**2, then
    sqrt(+1e-12). Output spatial dims: floor((H + 2 - 3)/2) + 1.
    """
    taps = np.asarray(hann_window_1d(filter_size), dtype=np.float32)
    win2d = np.outer(taps, taps)
    norm = win2d.sum()
    taps_n = taps / np.sqrt(norm)  # split normalization across the two passes
    pad = (filter_size - 2) // 2

    sq = jnp.square(x.astype(jnp.float32))
    # Pad once for both spatial passes.
    sq = jnp.pad(sq, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    k = len(taps_n)
    # 1-D pass along H (strided), then along W (strided): separable window.
    h_out = (sq.shape[1] - k) // stride + 1
    w_out = (sq.shape[2] - k) // stride + 1

    acc_h = None
    for i in range(k):
        sl = jax.lax.slice_in_dim(sq, i, i + (h_out - 1) * stride + 1, axis=1)
        sl = sl[:, ::stride]
        term = sl * taps_n[i]
        acc_h = term if acc_h is None else acc_h + term

    acc = None
    for j in range(k):
        sl = jax.lax.slice_in_dim(acc_h, j, j + (w_out - 1) * stride + 1, axis=2)
        sl = sl[:, :, ::stride]
        term = sl * taps_n[j]
        acc = term if acc is None else acc + term

    return jnp.sqrt(acc + 1e-12)
