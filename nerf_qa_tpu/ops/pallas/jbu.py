"""Fused joint-bilateral-upsampling filter as a Pallas TPU kernel.

The JBU adaptive filter (FeatUp ``JBULearnedRange``; consumed by
model_nr_v8.py:112-136 through models/nr/featup.py) computes, per output
pixel, a softmax over 49 range·spatial kernel weights and a weighted sum
of the 7x7 neighborhood of the bicubically upsampled source. Composed
from XLA ops that is either 49 serialized passes over the source
(lax.scan formulation — ~50x the minimum HBM traffic; measured 143 ms of
a 434 ms NR train step at 256²x384) or 49 materialized feature-map temps
(unrolled formulation — blows HBM). This kernel does the whole filter in
ONE pass: each grid step holds a row tile + 6-row halo of the projected
guidance and the upsampled source in VMEM, computes the 49 shifted
range dots, the softmax, and the weighted accumulation without touching
HBM again.

Halo trick: instead of manual DMA, the kernel receives TWO block views of
each (padded) input — the tile's rows and the NEXT tile's rows — so rows
[i·TH, i·TH + TH + 6) are always resident (TH >= 6). Costs a second read
of each input (still ~25x less traffic than the scan) and keeps the
standard Pallas pipeline double-buffering.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 8


def _jbu_kernel(sp_ref, tp_ref, hr0_ref, hr1_ref, pj0_ref, pj1_ref,
                out_ref, hr_s, pj_s, *, radius: int, w: int):
    # Streaming softmax over the 49 shifts: pass 1 finds the max logit,
    # pass 2 fuses exp + spatial weighting + source accumulation, so the
    # (TH, W, 49) weight tensor never materializes (a 49-way concat of
    # shifted slices also doesn't lower on Mosaic). Both passes run as
    # fori_loops with dynamic shift offsets into VMEM scratch — unrolled
    # shift loops keep ~23 (TH, W, C) temps live on the Mosaic stack and
    # blow scoped VMEM. The logit dot products are recomputed in pass 2 —
    # 49x32 VPU MACs/pixel, noise next to the (TH, W, C) accumulation.
    d = 2 * radius + 1
    th = out_ref.shape[1]
    c = out_ref.shape[-1]
    hr_s[:th] = hr0_ref[0]
    hr_s[th:] = hr1_ref[0]
    pj_s[:th] = pj0_ref[0]
    pj_s[th:] = pj1_ref[0]
    center = pj_s[radius:radius + th, radius:radius + w].astype(jnp.float32)
    temp = tp_ref[0, 0]

    # dy (row dim, untiled) may be a dynamic fori_loop index; dx offsets
    # the SUBLANE dim, where Mosaic requires statically-known alignment —
    # so the 7 dx shifts unroll statically inside each dy iteration.
    def logit(dy, dx):
        sh = pj_s[pl.ds(dy, th), pl.ds(dx, w), :].astype(jnp.float32)
        return temp * jnp.sum(sh * center, axis=-1)  # (TH, W)

    def max_body(dy, m):
        for dx in range(d):
            m = jnp.maximum(m, logit(dy, dx))
        return m

    m = jax.lax.fori_loop(
        0, d, max_body, jnp.full((th, w), -1e30, jnp.float32)
    )

    def acc_body(dy, carry):
        z, acc = carry
        for dx in range(d):
            wp = jnp.exp(logit(dy, dx) - m) * sp_ref[0, dy * d + dx]
            src = hr_s[pl.ds(dy, th), pl.ds(dx, w), :].astype(jnp.float32)
            z = z + wp
            acc = acc + src * wp[..., None]
        return z, acc

    z, acc = jax.lax.fori_loop(
        0, d, acc_body,
        (jnp.zeros((th, w), jnp.float32), jnp.zeros((th, w, c), jnp.float32)),
    )
    out_ref[0] = acc / jnp.maximum(z, 1e-30)[..., None]


@functools.partial(
    jax.jit, static_argnames=("radius", "tile_h", "interpret")
)
def _jbu_call(hr, proj, spatial, temp, *, radius: int, tile_h: int,
              interpret: bool):
    n, h, w, c = hr.shape
    k = proj.shape[-1]
    d = 2 * radius + 1
    gh = h // tile_h
    pad = ((0, 0), (radius, radius), (radius, radius), (0, 0))
    hr_p = jnp.pad(hr, pad, mode="reflect").astype(jnp.bfloat16)
    pj_p = jnp.pad(proj, pad, mode="reflect").astype(jnp.bfloat16)
    # H: (gh+1) tiles so block hi+1 always exists and covers the halo;
    # W: bf16 sublane alignment (multiple of 16)
    hp_pad = (gh + 1) * tile_h
    wp = w + 2 * radius
    wp_pad = -(-wp // 16) * 16
    zpad = ((0, 0), (0, hp_pad - (h + 2 * radius)), (0, wp_pad - wp), (0, 0))
    hr_p = jnp.pad(hr_p, zpad)
    pj_p = jnp.pad(pj_p, zpad)
    sp = spatial.reshape(1, d * d).astype(jnp.float32)
    tp = jnp.asarray(temp, jnp.float32).reshape(1, 1)

    block = lambda ch: pl.BlockSpec(
        (1, tile_h, wp_pad, ch),
        lambda ni, hi: (ni, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    block_next = lambda ch: pl.BlockSpec(
        (1, tile_h, wp_pad, ch),
        lambda ni, hi: (ni, hi + 1, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_jbu_kernel, radius=radius, w=w)
    return pl.pallas_call(
        kernel,
        grid=(n, gh),
        in_specs=[
            pl.BlockSpec((1, d * d), lambda ni, hi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda ni, hi: (0, 0),
                         memory_space=pltpu.SMEM),
            block(c), block_next(c), block(k), block_next(k),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c),
                               lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * tile_h, wp_pad, c), jnp.bfloat16),
            pltpu.VMEM((2 * tile_h, wp_pad, k), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * d * d * (k + c),
            bytes_accessed=2 * (hr_p.nbytes + pj_p.nbytes)
            + n * h * w * c * 4,
            transcendentals=n * h * w * d * d,
        ),
    )(sp, tp, hr_p, hr_p, pj_p, pj_p)


def jbu_filter(hr: jax.Array, proj: jax.Array, spatial: jax.Array,
               temp: jax.Array, radius: int = 3,
               interpret: bool | None = None) -> jax.Array:
    """Fused JBU adaptive filter.

    Args:
      hr: (N, H, W, C) bicubically upsampled source.
      proj: (N, H, W, K) learned range projection of the guidance.
      spatial: (d*d,) spatial Gaussian kernel values (d = 2*radius+1).
      temp: scalar range temperature (multiplies logits pre-softmax).
    Returns (N, H, W, C) float32 — identical math to the scan
    formulation in models/nr/featup.py.

    Forward-only: no VJP is defined (the JBU runs inside the FROZEN
    encoder — NRModel stop_gradients its outputs, model_nr_v8.py:156-166
    semantics). To fine-tune the upsampler itself, use the scan oracle
    (``JBU(fused=False)``), which is differentiable.

    H must divide by the 8-row tile; W must be a multiple of 16 (all JBU
    pyramid levels are powers of two >= 32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = hr.shape
    if h % _TILE_H or w % 16:
        raise ValueError(
            f"jbu_filter needs H % {_TILE_H} == 0 and W % 16 == 0, got "
            f"{h}x{w}"
        )
    return _jbu_call(hr, proj, spatial, temp, radius=radius,
                     tile_h=_TILE_H, interpret=interpret)
