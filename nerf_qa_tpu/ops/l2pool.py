"""Anti-aliased L2 pooling (hann-window energy pooling).

Reference behavior: nerf_qa/DISTS_pytorch/DISTS_pt.py:11-25 (``L2pooling``)
and its duplicate nerf_qa/ADISTS/ADISTS.py:16-31 (``Downsample``): square the
input, depthwise-convolve with a normalized 3x3 Hann window (hanning(5)
minus endpoints), stride 2, padding 1, then sqrt(.+1e-12).

TPU design notes
----------------
* NHWC layout (channels on the 128-lane axis).
* Size-dispatched formulation (both measured on v5e):
  - small maps (<= ~256²): a strided depthwise conv
    (feature_group_count=C) — ~3.5x faster than hand-separated strided
    slices and ~2x faster than shift-and-add; the band formulation loses
    here (4.4 vs 3.0 ms at 256²x64) because the op is
    launch/latency-bound.
  - large maps (full-resolution): the separable hann window as two
    strided banded-matrix matmuls on the MXU — the stride-2 depthwise
    conv runs on the VPU and is latency-bound at 1080p (23.6 ms for
    1080x1920x64 vs 12.6 banded; 1.9x). Same trick as ops/windowed.
* The conv runs in the caller's flow dtype; ``precision`` follows the
  caller's mode — HIGHEST for the fp32 parity path (always computed in
  fp32; XLA's default conv precision is bf16-grade), DEFAULT for the
  bf16 serving path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# above this pixel count the banded-MXU formulation wins over the
# depthwise conv (measured crossover between 256² = 65k and 270x480 =
# 130k on v5e)
_BAND_MIN_PIXELS = 100_000


@functools.cache
def _hann_kernel(filter_size: int) -> np.ndarray:
    """Normalized 2-D hann window: outer(h, h)/sum, h = hanning(k)[1:-1]."""
    taps = np.hanning(filter_size)[1:-1]
    win = np.outer(taps, taps)
    return (win / win.sum()).astype(np.float32)


@functools.cache
def _strided_band(in_size: int, filter_size: int, stride: int,
                  pad: int) -> np.ndarray:
    """(out, in) matrix applying the strided, zero-padded 1-D normalized
    hann window: row o holds the taps at columns o*stride + i - pad.
    outer(t,t)/sum(outer) == outer(t/sum t, t/sum t), so each axis uses
    the 1-D-normalized taps."""
    taps = np.hanning(filter_size)[1:-1]
    taps = taps / taps.sum()
    k = len(taps)
    out_size = (in_size + 2 * pad - k) // stride + 1
    mat = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        for i, t in enumerate(taps):
            src = o * stride + i - pad
            if 0 <= src < in_size:
                mat[o, src] = t
    return mat


def _l2pool_band(x: jax.Array, filter_size: int, stride: int, pad: int,
                 precision: jax.lax.Precision, dt: jnp.dtype) -> jax.Array:
    """Banded-MXU formulation (large maps): x² -> strided banded matmul
    over H, then over W, -> sqrt."""
    mh = jnp.asarray(_strided_band(x.shape[1], filter_size, stride, pad))
    mw = jnp.asarray(_strided_band(x.shape[2], filter_size, stride, pad))
    sq = jnp.square(x.astype(dt))
    y = jnp.einsum("oh,nhwc->nowc", mh.astype(dt), sq,
                   precision=precision, preferred_element_type=jnp.float32)
    y = jnp.einsum("ow,nhwc->nhoc", mw.astype(dt), y.astype(dt),
                   precision=precision, preferred_element_type=jnp.float32)
    return jnp.sqrt(y + 1e-12).astype(dt)


def l2pool(
    x: jax.Array,
    *,
    filter_size: int = 5,
    stride: int = 2,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """L2 pooling over an NHWC tensor.

    Matches ``L2pooling(filter_size=5, stride=2)``: 3x3 normalized hann
    window, stride 2, padding (filter_size-2)//2 = 1, on x**2, then
    sqrt(+1e-12). Output spatial dims: floor((H + 2*pad - 3)/2) + 1.
    """
    c = x.shape[-1]
    pad = (filter_size - 2) // 2
    # The pool runs in the caller's flow dtype: TPU convs can't fuse
    # elementwise producers, so the squared input is a materialized
    # buffer — squaring in fp32 when the pyramid flows bf16 would double
    # its HBM traffic. HIGHEST precision (the fp32 parity path) always
    # computes in fp32.
    dt = jnp.float32 if precision == jax.lax.Precision.HIGHEST else x.dtype
    if x.shape[1] * x.shape[2] > _BAND_MIN_PIXELS:
        return _l2pool_band(x, filter_size, stride, pad, precision, dt)
    win = _hann_kernel(filter_size)
    k = jnp.asarray(win)[:, :, None, None] * jnp.ones((1, 1, 1, c), jnp.float32)
    sq = jnp.square(x.astype(dt))
    out = jax.lax.conv_general_dilated(
        sq,
        k.astype(dt),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return jnp.sqrt(out + 1e-12).astype(dt)


def hann_window_1d(filter_size: int = 5) -> tuple[float, ...]:
    """1-D hann tap vector: np.hanning(filter_size)[1:-1], un-normalized."""
    return tuple(float(v) for v in np.hanning(filter_size)[1:-1])
