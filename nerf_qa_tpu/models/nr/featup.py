"""Learned joint-bilateral upsampling (JBU) semantic feature pyramid.

Reference behavior: model_nr_v8.py:112-136 — FeatUp
(``torch.hub.load("mhamilton723/FeatUp", vit_model)``) wraps a frozen ViT
and a JBU upsampler stack: four chained 2x guided upsamplings
(``upsampler.up1..up4``) plus a ``fixup_proj`` 0.1-residual projection
applied at every level, producing the 6-level semantic pyramid
[16², 32², 64², 128², 256², 256²] consumed by the RefineUp decoder.

This is a from-scratch JBU: for each hi-res pixel, a k x k neighborhood of
the low-res source is blended with weights = (learned-σ spatial Gaussian)
× (range kernel over projected guidance similarity). All gathers are
static shifted slices (TPU-friendly); the 2x ratio means the shifted
low-res terms upsample to target by a nearest reshape-tile, so the whole
op is elementwise + static slicing — XLA fuses it into a few passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _nearest_2x(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def _avgpool_to(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Average-pool guidance down to the source grid (integer factor)."""
    n, h, w, c = x.shape
    fh, fw = h // out_h, w // out_w
    x = x[:, : out_h * fh, : out_w * fw]
    x = x.reshape(n, out_h, fh, out_w, fw, c).mean(axis=(2, 4))
    return x


class JBU(nn.Module):
    """One learned 2x joint-bilateral upsampling stage."""

    dim: int
    guidance_dim: int = 32
    radius: int = 1  # 3x3 low-res neighborhood

    @nn.compact
    def __call__(self, source: jax.Array, image: jax.Array) -> jax.Array:
        """source: (N, h, w, C); image: (N, H, W, 3) full-res guidance.
        Returns (N, 2h, 2w, C)."""
        n, h, w, c = source.shape
        th, tw = h * 2, w * 2
        # guidance at target and source resolutions, projected; bilinear
        # resize (target may exceed the guidance image, e.g. 256 > 224)
        from nerf_qa_tpu.ops.resize import resize_bilinear

        g_proj = nn.Conv(self.guidance_dim, (1, 1), name="range_proj")
        g_hi = g_proj(resize_bilinear(image, th, tw))
        g_lo = _avgpool_to(g_hi, h, w)

        log_sigma_sp = self.param(
            "log_sigma_spatial", nn.initializers.zeros, ()
        )
        log_sigma_rg = self.param(
            "log_sigma_range", nn.initializers.zeros, ()
        )
        inv2_sp = 0.5 * jnp.exp(-2.0 * log_sigma_sp)
        inv2_rg = 0.5 * jnp.exp(-2.0 * log_sigma_rg)

        r = self.radius
        pad = ((0, 0), (r, r), (r, r), (0, 0))
        src_p = jnp.pad(source, pad, mode="edge")
        glo_p = jnp.pad(g_lo, pad, mode="edge")

        num = jnp.zeros((n, th, tw, c), source.dtype)
        den = jnp.zeros((n, th, tw, 1), source.dtype)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                src_n = _nearest_2x(
                    jax.lax.dynamic_slice(src_p, (0, r + dy, r + dx, 0),
                                          (n, h, w, c))
                )
                g_n = _nearest_2x(
                    jax.lax.dynamic_slice(glo_p, (0, r + dy, r + dx, 0),
                                          (n, h, w, self.guidance_dim))
                )
                dist2 = jnp.sum(jnp.square(g_hi - g_n), axis=-1,
                                keepdims=True)
                wgt = jnp.exp(
                    -(dy * dy + dx * dx) * inv2_sp - dist2 * inv2_rg
                )
                num = num + src_n * wgt
                den = den + wgt
        return num / (den + 1e-8)


class JBUStack(nn.Module):
    """Four chained JBU stages + fixup projection, producing the 6-level
    semantic pyramid (model_nr_v8.py:121-132)."""

    dim: int

    @nn.compact
    def __call__(self, feats: jax.Array, image: jax.Array) -> list[jax.Array]:
        f1 = feats
        f2 = JBU(self.dim, name="up1")(f1, image)
        f4 = JBU(self.dim, name="up2")(f2, image)
        f8 = JBU(self.dim, name="up3")(f4, image)
        f16 = JBU(self.dim, name="up4")(f8, image)
        fixup = nn.Conv(self.dim, (1, 1), name="fixup_proj")
        levels = [f1, f2, f4, f8, f16]
        levels = [fixup(f) * 0.1 + f for f in levels]
        return levels + [levels[-1]]
