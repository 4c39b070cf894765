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


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """NHWC bilinear resize, align_corners=False, no antialias.

    Bit-compatible with torch ``F.interpolate(mode='bilinear')`` up to
    float rounding. Works for both up- and down-scaling (downscaling
    without antialias, exactly as torch does by default).
    """
    n, h, w, c = x.shape
    x = x.astype(jnp.float32)
    if h != out_h:
        lo, hi, t = _lerp_weights(h, out_h)
        t = t[None, :, None, None]
        x = x[:, lo] * (1.0 - t) + x[:, hi] * t
    if w != out_w:
        lo, hi, t = _lerp_weights(w, out_w)
        t = t[None, None, :, None]
        x = x[:, :, lo] * (1.0 - t) + x[:, :, hi] * t
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
