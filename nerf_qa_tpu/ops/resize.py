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


def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bilinear interpolation matrix, half-pixel centers.

    Each row has <=2 nonzeros (the lerp weights); expressing the resize as
    two matmuls maps it onto the MXU — gathers over large spatial axes are
    pathologically slow on TPU (measured ~50x slower at 1080p).
    """
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
) -> jax.Array:
    """NHWC bilinear resize, align_corners=False, no antialias.

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
        ah = _resize_matrix(h, out_h) * (scale if first else 1.0)
        first = False
        x = jnp.einsum("oh,nhwc->nowc", jnp.asarray(ah, compute_dtype), x,
                       precision=precision,
                       preferred_element_type=jnp.float32).astype(compute_dtype)
    if w != out_w:
        aw = _resize_matrix(w, out_w) * (scale if first else 1.0)
        first = False
        x = jnp.einsum("pw,nhwc->nhpc", jnp.asarray(aw, compute_dtype), x,
                       precision=precision,
                       preferred_element_type=jnp.float32).astype(compute_dtype)
    out = x.astype(jnp.float32)
    return out * scale if first else out


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
