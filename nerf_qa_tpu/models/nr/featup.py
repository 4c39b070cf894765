"""Learned joint-bilateral upsampling (JBU) semantic feature pyramid.

Reference behavior: model_nr_v8.py:112-136 — FeatUp
(``torch.hub.load("mhamilton723/FeatUp", vit_model)``) wraps a frozen ViT
and a JBU upsampler stack: four chained 2x guided upsamplings
(``upsampler.up1..up4``) plus a ``fixup_proj`` 0.1-residual projection
applied at every level, producing the 6-level semantic pyramid
[16², 32², 64², 128², 256², 256²] consumed by the RefineUp decoder.

This mirrors FeatUp's ``JBULearnedRange`` math exactly so real hub
checkpoints convert faithfully (compat.torch_featup):

* guidance for each stage = adaptive-avg-pooled input image at 2x the
  source grid (FeatUp ``JBUStack.upsample``),
* range kernel = softmax over the 7x7 neighborhood of
  ``exp(range_temp) * <proj(g), proj(g_shifted)>`` where ``proj`` is a
  learned Conv1x1 -> GELU -> Dropout2d(0.1) -> Conv1x1 stack,
* spatial kernel = Gaussian over a [-1,1]-normalized 7x7 offset grid
  with learned ``sigma_spatial``,
* the combined normalized kernel adaptively filters the bicubically
  2x-upsampled source (reflect padding, as FeatUp's AdaptiveConv).

TPU design: all gathers are static shifted slices of the padded arrays
(49 shifts), the bicubic/pooling resamplers are MXU matmuls, everything
else is elementwise — XLA fuses the kernel computation into a few passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nerf_qa_tpu.models.nr.layers import Dropout2d
from nerf_qa_tpu.ops.resize import adaptive_avg_pool, resize_bicubic


class JBU(nn.Module):
    """One learned 2x joint-bilateral upsampling stage
    (FeatUp ``JBULearnedRange(guidance_dim=3, feat_dim, key_dim=32,
    radius=3)``).

    ``fused=None`` auto-selects the Pallas kernel (ops/pallas/jbu) on
    TPU — one HBM pass instead of 49 serialized shift passes (measured
    143 ms -> ~10 ms of the NR train step) — and the lax.scan oracle
    elsewhere. ``fused=False`` forces the oracle."""

    dim: int
    guidance_dim: int = 3
    key_dim: int = 32
    radius: int = 3
    fused: bool | None = None

    @nn.compact
    def __call__(self, source: jax.Array, guidance: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """source: (N, h, w, C); guidance: (N, 2h, 2w, guidance_dim)
        already pooled to the target grid. Returns (N, 2h, 2w, C)."""
        n, h, w, c = source.shape
        gh, gw = guidance.shape[1:3]
        r = self.radius
        d = 2 * r + 1

        # learned range projection (FeatUp range_proj Sequential:
        # Conv1x1 -> GELU -> Dropout2d(0.1) -> Conv1x1)
        k = nn.Conv(self.key_dim, (1, 1), name="range_proj_in")(guidance)
        k = nn.gelu(k, approximate=False)  # torch nn.GELU (exact erf)
        k = Dropout2d(0.1)(k, deterministic)
        proj = nn.Conv(self.key_dim, (1, 1), name="range_proj_out")(k)

        range_temp = self.param("range_temp", nn.initializers.zeros, ())
        sigma_spatial = self.param(
            "sigma_spatial", nn.initializers.ones, ()
        )
        temp = jnp.clip(jnp.exp(range_temp), 1e-4, 1e4)

        hr = resize_bicubic(source, gh, gw)

        # spatial Gaussian over the [-1,1]-normalized offset grid
        # (FeatUp get_spatial_kernel: linspace(-1,1,diameter) meshgrid)
        offs = np.linspace(-1.0, 1.0, d, dtype=np.float32)
        sq = offs[:, None] ** 2 + offs[None, :] ** 2  # (d, d)
        spatial = jnp.exp(
            -jnp.asarray(sq.reshape(-1)) / (2.0 * sigma_spatial**2)
        )  # (d*d,)

        fused = (jax.default_backend() == "tpu"
                 if self.fused is None else self.fused)
        if fused and gh % 8 == 0 and gw % 16 == 0:
            from nerf_qa_tpu.ops.pallas.jbu import jbu_filter

            return jbu_filter(hr, proj, spatial, temp, radius=r)

        pad = ((0, 0), (r, r), (r, r), (0, 0))
        proj_p = jnp.pad(proj, pad, mode="reflect")
        hr_p = jnp.pad(hr, pad, mode="reflect")

        # range logits for every shift: <proj(center), proj(shifted)>.
        # Both shift loops run as lax.scan so only ONE shifted temp is
        # live at a time — an unrolled loop at 256²x384 keeps ~49 fp32
        # feature-map temps and blows HBM in the train step.
        shift_ids = jnp.arange(d * d)

        def logit_body(_, p):
            dy, dx = p // d, p % d
            shifted = jax.lax.dynamic_slice(
                proj_p, (0, dy, dx, 0), (n, gh, gw, self.key_dim)
            )
            return None, jnp.sum(shifted * proj, axis=-1)

        _, logits = jax.lax.scan(logit_body, None, shift_ids)
        logits = jnp.moveaxis(logits, 0, -1)  # (N, gh, gw, d*d)
        range_k = jax.nn.softmax(temp * logits, axis=-1)
        combined = range_k * spatial
        combined = combined / jnp.clip(
            combined.sum(axis=-1, keepdims=True), 1e-7
        )

        # adaptive filtering of the bicubic-upsampled source
        def filter_body(carry, p):
            dy, dx = p // d, p % d
            src_n = jax.lax.dynamic_slice(
                hr_p, (0, dy, dx, 0), (n, gh, gw, c)
            )
            w_p = jax.lax.dynamic_slice_in_dim(combined, p, 1, axis=3)
            return carry + src_n * w_p, None

        out, _ = jax.lax.scan(
            filter_body, jnp.zeros((n, gh, gw, c), jnp.float32), shift_ids
        )
        return out


class JBUStack(nn.Module):
    """Four chained JBU stages + fixup projection, producing the 6-level
    semantic pyramid (model_nr_v8.py:121-132). Matches FeatUp's JBUStack:
    per-stage guidance = adaptive_avg_pool2d(image, 2x source grid);
    fixup_proj = Dropout2d(0.2) -> Conv1x1, applied at every level with a
    0.1 residual (the reference applies it per level, model_nr_v8.py:
    126-131)."""

    dim: int
    fused: bool | None = None  # see JBU.fused

    @nn.compact
    def __call__(self, feats: jax.Array, image: jax.Array,
                 deterministic: bool = True) -> list[jax.Array]:
        fixup = nn.Conv(self.dim, (1, 1), name="fixup_proj")
        drop = Dropout2d(0.2)
        levels = [feats]
        f = feats
        for i in range(1, 5):
            h, w = f.shape[1:3]
            g = adaptive_avg_pool(image, h * 2, w * 2)
            f = JBU(self.dim, name=f"up{i}", fused=self.fused)(
                f, g, deterministic
            )
            levels.append(f)
        levels = [
            fixup(drop(x, deterministic)) * 0.1 + x for x in levels
        ]
        return levels + [levels[-1]]
