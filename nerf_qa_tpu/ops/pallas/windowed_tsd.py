"""Fused windowed texture/structure distortion map as a Pallas TPU kernel.

ADISTS' per-stage hot loop (ADISTS.py:168-187) needs, per channel, five
21x21 Gaussian-windowed moments of an (fx, fy) feature pair, the T/S
similarity ratios, and the ps-blended channel-weighted sum. Composed from
XLA ops (ops/windowed.py banded matmuls) that is ~10 full passes over
each stage's feature maps plus five VALID moment maps materialized per
channel block. This kernel computes the whole per-stage D-map in ONE
HBM pass over the pair:

* layout: channels-major (C, H, W) tiles — W rides the 128 lanes at full
  utilization for any channel count (NHWC tiles would waste lanes on
  narrow stages);
* H-pass: 21 static sublane-shifted accumulations build the five
  H-filtered moments in VMEM;
* W-pass: one dense band-matrix matmul per moment on the MXU (the band
  matrix lives in VMEM — that caps the kernel at W <= 512; full-res
  1080p stays on the channel-blocked XLA path);
* T/S, ps blend, and the channel-weighted reduction finish in-register;
  the output tile accumulates across the channel grid dimension.

Halo rows come from a second block view of the padded input (TH >=
window 21 - 1), the same trick as ops/pallas/jbu.py.

MEASURED NEGATIVE RESULT (v5e, B=64 @256², bf16): 336 fr/s vs the XLA
banded-matmul path's 425 fr/s (tuned over cb∈{16,32}, TH∈{32,64}). The
21-tap VPU accumulation pass is the bottleneck — the MXU runs the
"wasteful" dense band matmuls faster than the VPU runs the minimal tap
arithmetic, and at these sizes the XLA path is bandwidth-bound, not
pass-count-bound, so the fusion saves less than the VPU costs. Kept as
an opt-in (ADISTSConfig.fused_tsd=True) correctness-tested reference; a
winning variant would do BOTH window passes as in-kernel MXU band
matmuls and tile W for full-res maps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_qa_tpu.ops.windowed import gaussian_taps

_TILE_H = 32  # >= window_size - 1 for the two-view halo; bf16 sublane-aligned
_MAX_W = 512  # band matrix must fit VMEM; larger W uses the XLA path
_EPS = 1e-6


def fits_kernel(h: int, w: int, window_size: int = 21) -> bool:
    return (window_size <= _TILE_H + 1 and w <= _MAX_W
            and h >= window_size and w >= window_size)


def _band(w: int, taps) -> np.ndarray:
    """(W, Wk) dense band matrix: column o applies the taps at rows
    o..o+K-1 (the transpose of ops/windowed._band_matrix)."""
    k = len(taps)
    wk = w - k + 1
    mat = np.zeros((w, wk), np.float32)
    for i, t in enumerate(taps):
        mat[np.arange(wk) + i, np.arange(wk)] = t
    return mat


def _tsd_kernel(tap_ref, w_ref, fx0, fx1, fy0, fy1, ps_ref, band_ref,
                out_ref, xs, ys, *, window_size: int, cb: int):
    th = out_ref.shape[1]
    wk = out_ref.shape[2]
    k = window_size
    xs[:, :th] = fx0[0]
    xs[:, th:] = fx1[0]
    ys[:, :th] = fy0[0]
    ys[:, th:] = fy1[0]
    x = xs[...]  # (CB, 2TH, W)
    y = ys[...]

    shape = (cb, th, x.shape[-1])
    hx = jnp.zeros(shape, jnp.float32)
    hy = jnp.zeros(shape, jnp.float32)
    hxx = jnp.zeros(shape, jnp.float32)
    hyy = jnp.zeros(shape, jnp.float32)
    hxy = jnp.zeros(shape, jnp.float32)
    for t in range(k):
        tap = tap_ref[0, t]
        sx = x[:, t:t + th, :].astype(jnp.float32)
        sy = y[:, t:t + th, :].astype(jnp.float32)
        hx = hx + tap * sx
        hy = hy + tap * sy
        hxx = hxx + tap * sx * sx
        hyy = hyy + tap * sy * sy
        hxy = hxy + tap * sx * sy

    band = band_ref[...]

    def wpass(m):
        flat = m.reshape(cb * th, m.shape[-1])
        return jnp.dot(flat, band,
                       preferred_element_type=jnp.float32).reshape(
            cb, th, wk
        )

    mx = wpass(hx)
    my = wpass(hy)
    vx = wpass(hxx) - jnp.square(mx)
    vy = wpass(hyy) - jnp.square(my)
    cov = wpass(hxy) - mx * my

    t_map = (2.0 * mx * my + _EPS) / (jnp.square(mx) + jnp.square(my) + _EPS)
    s_map = (2.0 * cov + _EPS) / (vx + vy + _EPS)
    ps = ps_ref[0]  # (TH, Wk)
    blend = (1.0 - ps)[None] * t_map + ps[None] * s_map  # (CB, TH, Wk)

    ni = pl.program_id(0)
    ci = pl.program_id(2)
    base = ci * cb
    acc = jnp.zeros((th, wk), jnp.float32)
    for c in range(cb):
        acc = acc + w_ref[ni, base + c] * blend[c]

    @pl.when(ci == 0)
    def _():
        out_ref[0] = acc

    @pl.when(ci > 0)
    def _():
        out_ref[0] = out_ref[0] + acc


@functools.partial(
    jax.jit, static_argnames=("window_size", "interpret")
)
def _tsd_call(fx, fy, ps, weights, *, window_size: int, interpret: bool):
    n, h, w, c = fx.shape
    k = window_size
    hk, wk = h - k + 1, w - k + 1
    th = _TILE_H
    nt = -(-hk // th)
    hp = (nt + 1) * th  # +1 so the next-tile halo view always exists
    cb = 32
    ncb = -(-c // cb)
    cp = ncb * cb

    def to_cmajor(a):
        a = jnp.moveaxis(a.astype(jnp.bfloat16), -1, 1)  # (N, C, H, W)
        a = jnp.pad(a, ((0, 0), (0, cp - c), (0, hp - h), (0, 0)))
        return a.reshape(n * ncb, cb, hp, w)

    fxc = to_cmajor(fx)
    fyc = to_cmajor(fy)
    ps_p = jnp.pad(ps.astype(jnp.float32), ((0, 0), (0, nt * th - hk),
                                            (0, 0)))
    w_p = jnp.pad(weights.astype(jnp.float32), ((0, 0), (0, cp - c)))
    taps = np.asarray(gaussian_taps(k, k / 3.0), np.float32)
    tap = jnp.asarray(taps).reshape(1, k)
    band = jnp.asarray(_band(w, tuple(taps)))

    view = lambda off: pl.BlockSpec(
        (1, cb, th, w),
        lambda ni, hi, ci, o=off: (ni * ncb + ci, 0, hi + o, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_tsd_kernel, window_size=k, cb=cb),
        grid=(n, nt, ncb),
        in_specs=[
            pl.BlockSpec((1, k), lambda ni, hi, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, cp), lambda ni, hi, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            view(0), view(1), view(0), view(1),
            pl.BlockSpec((1, th, wk), lambda ni, hi, ci: (ni, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, wk), lambda ni, hi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wk), lambda ni, hi, ci: (ni, hi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nt * th, wk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cb, 2 * th, w), jnp.bfloat16),
            pltpu.VMEM((cb, 2 * th, w), jnp.bfloat16),
        ],
        # the unrolled 21-tap loop keeps ~2 slice temps per tap live on
        # the Mosaic stack (same as ops/pallas/jbu.py); the default 16M
        # scoped limit is too small, the chip has 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * cp * hk * (5 * k * w + 5 * w * wk // 16),
            bytes_accessed=2 * (fxc.nbytes + fyc.nbytes)
            + n * nt * th * wk * 4,
            transcendentals=0,
        ),
    )(tap, w_p, fxc, fxc, fyc, fyc, ps_p, band)
    return out[:, :hk]


def windowed_tsd(fx: jax.Array, fy: jax.Array, ps: jax.Array,
                 weights: jax.Array, window_size: int = 21,
                 interpret: bool | None = None) -> jax.Array:
    """Channel-weighted ps-blended T/S distortion map, (N, Hk, Wk).

    Args:
      fx, fy: (N, H, W, C) spatially L2-normalized feature pair.
      ps: (N, Hk, Wk) or (N, Hk, Wk, 1) structure probability map.
      weights: (N, C) entropy channel weights (zero-padded channels
        contribute zero — their T=S=1 rows are multiplied by 0).
    Equivalent to the window_mean/T/S composition in core.adists.forward;
    bf16 inputs with fp32 accumulation (the serving-precision path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = fx.shape
    if not fits_kernel(h, w, window_size):
        raise ValueError(
            f"windowed_tsd supports {window_size}<=H, {window_size}<=W<="
            f"{_MAX_W}, got {h}x{w}"
        )
    if ps.ndim == 4:
        ps = ps[..., 0]
    return _tsd_call(fx, fy, ps, weights, window_size=window_size,
                     interpret=interpret)
