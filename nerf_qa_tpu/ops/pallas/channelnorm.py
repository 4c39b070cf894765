"""Fused ChannelNorm(+GELU) as a Pallas TPU kernel with a custom VJP.

MEASURED NEGATIVE RESULT on v5e — kept opt-in (models/nr/layers.py
routes here only under NERF_QA_TPU_FUSED_CN=1), default path is the jnp
oracle. Numbers (B=8, 256²x448 bf16, fori-loop timing at iters=100 —
smaller iteration counts fold the ~30 ms per-call tunnel round-trip
into every op, see utils/benchtime):

* jnp oracle CN+GELU: 2.2 ms/it. XLA fuses the normalize/affine/GELU
  chain INTO the surrounding passes (it even elides the output write
  when the consumer is a reduction) — the "multi-pass norm" this kernel
  set out to fuse does not actually exist as separate passes.
* This kernel: 4.7 ms/it forward; a PURE COPY Pallas kernel over the
  same blocks runs at 4.3 ms/it (~160 GB/s of real read+write traffic)
  regardless of tile size (512..4096 rows), aliasing, or vmem limits.
  The Pallas pipeline streams far below XLA's fused-pass bandwidth and
  is opaque to fusion, so a 2-3-pass fusion loses twice.
* End-to-end ground truth: NR train step 765 ms vs 358 ms at B=4 with
  this kernel routed in. Lesson: on this part Pallas pays off only when
  a kernel removes MANY passes (ops/pallas/jbu's 49-shift filter,
  ops/pallas/moments' 12-reduction stats), not for 2-3-pass
  elementwise/norm fusions.

Design (for the record): ChannelNorm (FeatUp's per-pixel channel
LayerNorm; every v7/v8 NR decoder block, model_nr_v8.py:22,40) reduces
over the CHANNEL axis at each spatial position. The forward kernel does
norm + affine + GELU in one read/write pass; the backward kernel
recomputes the moments from the saved input and emits dx plus
grid-accumulated dscale/dbias in one pass over (x, g).

Layout: x is flattened to (P, C) rows (P = N·H·W); the channel axis
stays minor so the per-pixel reduction is a lane reduction on the VPU,
and row tiles of 512 keep several fp32 temporaries comfortably in VMEM.
C need not be a multiple of 128 (Mosaic masks the lane padding) — the NR
decoder's 387/448-channel maps hit this.

GELU uses the tanh approximation. NOTE: models/nr/layers.py now uses the
EXACT (erf) GELU for torch-checkpoint parity (torch nn.GELU's default),
so this opt-in kernel additionally differs from the module path by the
tanh-vs-erf approximation (~1e-3 max) — one more reason it stays a
reference formulation rather than the default (it is a measured
performance negative regardless, see the module docstring above).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_P = 256
_K = 0.7978845608028654  # sqrt(2/pi)
_A = 0.044715


def _gelu_fwd(y):
    u = _K * (y + _A * y * y * y)
    return 0.5 * y * (1.0 + jnp.tanh(u))


def _gelu_grad(y):
    u = _K * (y + _A * y * y * y)
    t = jnp.tanh(u)
    return 0.5 * (1.0 + t) + 0.5 * y * (1.0 - t * t) * _K * (
        1.0 + 3.0 * _A * y * y
    )


def _moments(xf, c, eps):
    mean = jnp.sum(xf, axis=-1, keepdims=True) * (1.0 / c)
    xc = xf - mean
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * (1.0 / c)
    return xc, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, c: int, eps: float,
                gelu: bool):
    xf = x_ref[...].astype(jnp.float32)
    xc, rstd = _moments(xf, c, eps)
    y = (xc * rstd) * s_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    if gelu:
        y = _gelu_fwd(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, s_ref, b_ref, dx_ref, ds_ref, db_ref, *,
                c: int, eps: float, gelu: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    xf = x_ref[...].astype(jnp.float32)
    xc, rstd = _moments(xf, c, eps)
    xhat = xc * rstd
    scale = s_ref[...].astype(jnp.float32)
    dy = g_ref[...].astype(jnp.float32)
    if gelu:
        y = xhat * scale + b_ref[...].astype(jnp.float32)
        dy = dy * _gelu_grad(y)
    ds_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    gs = dy * scale
    m1 = jnp.sum(gs, axis=-1, keepdims=True) * (1.0 / c)
    m2 = jnp.sum(gs * xhat, axis=-1, keepdims=True) * (1.0 / c)
    dx_ref[...] = (rstd * (gs - m1 - xhat * m2)).astype(dx_ref.dtype)


def _row_specs(c):
    row = pl.BlockSpec((_TILE_P, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return row, vec


@functools.partial(jax.jit,
                   static_argnames=("gelu", "eps", "interpret"))
def _fwd_call(x2, scale, bias, *, gelu: bool, eps: float,
              interpret: bool):
    p, c = x2.shape
    row, vec = _row_specs(c)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, eps=eps, gelu=gelu),
        grid=(p // _TILE_P,),
        in_specs=[row, vec, vec],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((p, c), x2.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * p * c,
            bytes_accessed=2 * x2.nbytes,
            transcendentals=p * c if gelu else 0,
        ),
    )(x2, scale.reshape(1, c), bias.reshape(1, c))


@functools.partial(jax.jit,
                   static_argnames=("gelu", "eps", "interpret"))
def _bwd_call(x2, g2, scale, bias, *, gelu: bool, eps: float,
              interpret: bool):
    p, c = x2.shape
    row, vec = _row_specs(c)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, eps=eps, gelu=gelu),
        grid=(p // _TILE_P,),
        in_specs=[row, row, vec, vec],
        out_specs=(row, vec, vec),
        out_shape=(
            jax.ShapeDtypeStruct((p, c), x2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * p * c,
            bytes_accessed=3 * p * c * x2.dtype.itemsize,
            transcendentals=p * c if gelu else 0,
        ),
    )(x2, g2, scale.reshape(1, c), bias.reshape(1, c))
    return dx, ds.reshape(c), db.reshape(c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _cn_act(x, scale, bias, gelu, eps, interpret):
    return _fwd_call(x, scale, bias, gelu=gelu, eps=eps,
                     interpret=interpret)


def _cn_act_fwd(x, scale, bias, gelu, eps, interpret):
    out = _fwd_call(x, scale, bias, gelu=gelu, eps=eps,
                    interpret=interpret)
    return out, (x, scale, bias)


def _cn_act_bwd(gelu, eps, interpret, res, g):
    x, scale, bias = res
    dx, ds, db = _bwd_call(x, g.astype(x.dtype), scale, bias, gelu=gelu,
                           eps=eps, interpret=interpret)
    return dx, ds, db


_cn_act.defvjp(_cn_act_fwd, _cn_act_bwd)


def channel_norm_act(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     *, gelu: bool = False, eps: float = 1e-5,
                     interpret: bool | None = None) -> jax.Array:
    """Fused per-pixel channel LayerNorm + affine (+ tanh-GELU).

    Args:
      x: (..., C) activations (any leading shape; bf16 or fp32).
      scale, bias: (C,) affine parameters (fp32).
    Returns an array of x's shape and dtype; statistics and the GELU run
    in fp32 regardless of input dtype (ChannelNorm's parity contract,
    models/nr/layers.py).

    Rows are padded to the 256-row tile with zeros; padded rows produce
    garbage outputs that are sliced off, and the backward kernel sees
    zero cotangents for them so dscale/dbias stay exact.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c = x.shape[-1]
    p = x.size // c
    x2 = x.reshape(p, c)
    pad = -p % _TILE_P
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = _cn_act(x2, scale, bias, gelu, eps, interpret)
    if pad:
        out = out[:p]
    return out.reshape(x.shape)
