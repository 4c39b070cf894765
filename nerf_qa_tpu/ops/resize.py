"""Bilinear resize primitives with exact torch semantics.

The reference uses two different resamplers that must NOT be conflated:

* ``F.interpolate(mode='bilinear', align_corners=False)`` — no antialiasing
  (reference: nerf_qa/data.py:81-82,490-494). Implemented here as
  :func:`resize_bilinear` via explicit gather+lerp so numerics match torch.
* PIL / antialiased downscale (reference: DISTS_pt.py:210-217
  ``prepare_image`` resizes PIL images). Host-side decode keeps using PIL;
  for on-device antialiased downscale use :func:`resize_bilinear_aa`
  (jax.image.resize, which applies a scale-dependent kernel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _lerp_weights(in_size: int, out_size: int):
    """Half-pixel-center source coordinates (align_corners=False)."""
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = src - lo.astype(jnp.float32)
    return lo, hi, w_hi


def _resize_matrix(in_size: int, out_size: int,
                   align_corners: bool = False) -> np.ndarray:
    """(out, in) bilinear interpolation matrix.

    Each row has <=2 nonzeros (the lerp weights); expressing the resize as
    two matmuls maps it onto the MXU — gathers over large spatial axes are
    pathologically slow on TPU (measured ~50x slower at 1080p).
    align_corners selects torch's two coordinate conventions (the NR v6
    decoder injects trans_decode with align_corners=True,
    model_nr_v6.py:82).
    """
    if align_corners:
        scale = (in_size - 1) / max(out_size - 1, 1)
        src = np.arange(out_size, dtype=np.float64) * scale
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    t = (src - lo).astype(np.float32)
    mat = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    mat[rows, lo] += 1.0 - t
    mat[rows, hi] += t
    return mat


def resize_bilinear(
    x: jax.Array,
    out_h: int,
    out_w: int,
    *,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype = jnp.float32,
    scale: float = 1.0,
    align_corners: bool = False,
) -> jax.Array:
    """NHWC bilinear resize, no antialias.

    Matches torch ``F.interpolate(mode='bilinear')`` (two-term lerp per
    output pixel; the matmul formulation adds only exact zeros, so fp32
    results are identical). Works for both up- and down-scaling
    (downscaling without antialias, exactly as torch does by default).

    Serving fast path: ``compute_dtype=bfloat16, precision=DEFAULT`` runs
    the two matmuls on the MXU at full rate; ``scale`` folds a scalar
    (e.g. 1/255 for uint8 inputs) into the first resize matrix for free.
    """
    n, h, w, c = x.shape
    x = x.astype(compute_dtype)
    first = True
    if h != out_h:
        ah = _resize_matrix(h, out_h, align_corners) * (scale if first else 1.0)
        first = False
        x = jnp.einsum("oh,nhwc->nowc", jnp.asarray(ah, compute_dtype), x,
                       precision=precision,
                       preferred_element_type=jnp.float32).astype(compute_dtype)
    if w != out_w:
        aw = _resize_matrix(w, out_w, align_corners) * (scale if first else 1.0)
        first = False
        x = jnp.einsum("pw,nhwc->nhpc", jnp.asarray(aw, compute_dtype), x,
                       precision=precision,
                       preferred_element_type=jnp.float32).astype(compute_dtype)
    out = x.astype(jnp.float32)
    return out * scale if first else out


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution tap weights for fractional offsets ``t`` in [0,1).

    Returns (len(t), 4) weights for taps at offsets (-1, 0, 1, 2) relative
    to floor(src) — the kernel torch uses for mode='bicubic' (A=-0.75).
    """
    t = np.asarray(t, np.float64)

    def k1(x):  # |x| <= 1
        return (a + 2) * x**3 - (a + 3) * x**2 + 1

    def k2(x):  # 1 < |x| < 2
        return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a

    return np.stack(
        [k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t)], axis=1
    ).astype(np.float32)


def _bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bicubic interpolation matrix matching torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` (half-pixel
    centers, A=-0.75, border-clamped taps)."""
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base
    w = _cubic_weights(t)
    mat = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    for k in range(4):
        idx = np.clip(base - 1 + k, 0, in_size - 1)
        np.add.at(mat, (rows, idx), w[:, k])
    return mat


def resize_bicubic(
    x: jax.Array,
    out_h: int,
    out_w: int,
    *,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """NHWC bicubic resize with exact torch semantics (align_corners=False,
    no antialias) as two MXU matmuls. Used by the FeatUp JBU upsampler
    (FeatUp's JBULearnedRange bicubic-upsamples the source before adaptive
    filtering)."""
    n, h, w, c = x.shape
    x = x.astype(jnp.float32)
    if h != out_h:
        x = jnp.einsum("oh,nhwc->nowc", jnp.asarray(_bicubic_matrix(h, out_h)),
                       x, precision=precision)
    if w != out_w:
        x = jnp.einsum("pw,nhwc->nhpc", jnp.asarray(_bicubic_matrix(w, out_w)),
                       x, precision=precision)
    return x


def adaptive_avg_pool(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """NHWC adaptive average pooling with exact torch semantics: output
    bin i averages input[floor(i*H/out) : ceil((i+1)*H/out)]. Expressed as
    two matmuls (MXU-friendly). FeatUp's JBUStack pools the guidance image
    to 2x the source grid at every stage."""
    def mat(in_size: int, out_size: int) -> np.ndarray:
        m = np.zeros((out_size, in_size), np.float32)
        for i in range(out_size):
            lo = (i * in_size) // out_size
            hi = -((-(i + 1) * in_size) // out_size)
            m[i, lo:hi] = 1.0 / (hi - lo)
        return m

    n, h, w, c = x.shape
    x = x.astype(jnp.float32)
    if h != out_h:
        x = jnp.einsum("oh,nhwc->nowc", jnp.asarray(mat(h, out_h)), x,
                       precision=jax.lax.Precision.HIGHEST)
    if w != out_w:
        x = jnp.einsum("pw,nhwc->nhpc", jnp.asarray(mat(w, out_w)), x,
                       precision=jax.lax.Precision.HIGHEST)
    return x


def resize_bilinear_aa(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Antialiased bilinear resize (triangle kernel scaled by the ratio).

    Matches torch ``interpolate(..., antialias=True)`` / PIL-style
    downscaling closely; use for prepare_image-equivalent device paths.
    """
    n, h, w, c = x.shape
    return jax.image.resize(
        x.astype(jnp.float32), (n, out_h, out_w, c), method="bilinear"
    )


def shortest_side_target(h: int, w: int, side: int = 256) -> tuple[int, int]:
    """Aspect-preserving resize target: shortest side -> ``side``.

    Mirrors ``transforms.functional.resize(image, 256)`` geometry used by
    the reference's keep_aspect_ratio path (DISTS_pt.py:212-213).
    """
    if h <= w:
        return side, max(1, round(w * side / h))
    return max(1, round(h * side / w)), side
