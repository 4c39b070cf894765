"""Fused DISTS moment reductions as a Pallas TPU kernel.

The DISTS statistics (DISTS_pt.py:131-139) need, per channel of each
pyramid stage, five spatial moments of a feature pair: E[x], E[y], E[x²],
E[y²], E[xy]. Composed naively that is ~3 HBM passes over each feature
map (mean, centered-square, product). This kernel computes all five sums
in ONE pass per input, tiled over rows so full-resolution (1080p) stage-1
maps never need more than a slice in VMEM.

Numerics: accumulation in float32; variance/covariance are formed as
E[x²]-E[x]² (single pass) instead of the reference's two-pass
E[(x-mean)²]. For [0,1]-ranged VGG features this matches the two-pass
oracle to ~1e-6 relative; the XLA path (core/dists.stage_stats_xla) stays
available as the bit-parity oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_qa_tpu.core.dists import StageStats

# 8 output sublanes (fp32 min tile); rows 0-4 hold the five moments.
_OUT_ROWS = 8
# VMEM budget per input block (bytes); two inputs resident + output.
_BLOCK_BYTES = 2 * 1024 * 1024


def _pick_tile_h(h: int, w: int, c: int) -> int:
    # VMEM blocks are padded to 128 lanes / 8 sublanes; budget accordingly
    # (each input is double-buffered by the pipeline).
    padded_c = -(-c // 128) * 128
    rows = max(1, _BLOCK_BYTES // max(1, w * padded_c * 4) // 2)
    return min(h, -(-rows // 8) * 8 if rows >= 8 else rows)


def _moments_kernel(fx_ref, fy_ref, out_ref, *, tile_h: int, height: int):
    i = pl.program_id(1)
    x = fx_ref[0].astype(jnp.float32)  # (TH, W, C)
    y = fy_ref[0].astype(jnp.float32)
    if height % tile_h != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        valid = (i * tile_h + row) < height
        x = jnp.where(valid, x, 0.0)
        y = jnp.where(valid, y, 0.0)
    sums = jnp.stack(
        [
            jnp.sum(x, axis=(0, 1)),
            jnp.sum(y, axis=(0, 1)),
            jnp.sum(x * x, axis=(0, 1)),
            jnp.sum(y * y, axis=(0, 1)),
            jnp.sum(x * y, axis=(0, 1)),
        ]
    )  # (5, C)
    pad = jnp.zeros((_OUT_ROWS - 5, x.shape[-1]), jnp.float32)
    partial = jnp.concatenate([sums, pad], axis=0)[None]  # (1, 8, C)

    @pl.when(i == 0)
    def _():
        out_ref[...] = partial

    @pl.when(i > 0)
    def _():
        out_ref[...] = out_ref[...] + partial


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moment_sums(fx: jax.Array, fy: jax.Array, *, interpret: bool = False):
    n, h, w, c = fx.shape
    tile_h = _pick_tile_h(h, w, c)
    grid = (n, pl.cdiv(h, tile_h))
    kernel = functools.partial(_moments_kernel, tile_h=tile_h, height=h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w, c), lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _OUT_ROWS, c), lambda ni, hi: (ni, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, _OUT_ROWS, c), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * n * h * w * c,
            bytes_accessed=2 * n * h * w * c * fx.dtype.itemsize,
            transcendentals=0,
        ),
    )(fx, fy)
    return out


def stage_stats_pallas(fx: jax.Array, fy: jax.Array,
                       *, interpret: bool | None = None) -> StageStats:
    """Drop-in replacement for ``stage_stats_xla`` (one HBM pass/input).

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    code path runs in CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = fx.shape
    sums = _moment_sums(fx, fy, interpret=interpret)
    inv = 1.0 / (h * w)
    mean_x = sums[:, 0] * inv
    mean_y = sums[:, 1] * inv
    var_x = sums[:, 2] * inv - jnp.square(mean_x)
    var_y = sums[:, 3] * inv - jnp.square(mean_y)
    cov = sums[:, 4] * inv - mean_x * mean_y
    return StageStats(mean_x, mean_y, var_x, var_y, cov)
