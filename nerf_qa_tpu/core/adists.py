"""ADISTS — adaptive DISTS with per-pixel structure/texture weighting.

Reference behavior: nerf_qa/ADISTS/ADISTS.py:34-197. Same VGG16+L2pool
pyramid as DISTS, then:

1. ``compute_prob`` (:71-100): per stage (coarse -> fine), windowed
   variance/mean ratio γ; ps = sigmoid((γ - mean γ)/(std γ)); min/max
   renormalized; multiplied with the bilinear-upsampled coarser product
   and renormalized again. Stages too small for the window use global
   stats and plain sigmoid(γ) (the reference reaches that path via
   try/except; here it's a static shape predicate).
2. Entropy channel weights (:127-135): spatially L2-normalized ReLU
   features -> per-channel Shannon entropy -> normalized, then clamped to
   mean ± 0.5·std and renormalized (:152-160).
3. Per-stage windowed T (texture) and S (structure) similarity maps of
   the spatially L2-normalized features (:168-183); weighted blend
   D = Σ (pt·T + ps·S)·w (:182-191).

Outputs: scalar loss 1 - mean(D) (as_loss), per-image 1 - D, or a
full-resolution distortion map 1 - Σ upsampled D_maps (as_map).

TPU notes: everything is static-shape; the coarse->fine recursion is a
Python loop over 6 static stages (unrolled by jit); windowed moments run
as separable banded matmuls on the MXU (ops/windowed.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from nerf_qa_tpu.config import ADISTSConfig
from nerf_qa_tpu.core.vgg import vgg16_pyramid
from nerf_qa_tpu.ops.resize import resize_bilinear
from nerf_qa_tpu.ops.windowed import fits_window, window_mean

_C0 = 1e-12


def _resize_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True (compute_prob uses it,
    ADISTS.py:87)."""
    n, h, w, c = x.shape
    x = x.astype(jnp.float32)

    def coords(in_size, out_size):
        if out_size == 1 or in_size == 1:
            return jnp.zeros((out_size,), jnp.float32)
        return jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)

    def interp(x, axis, out_size):
        src = coords(x.shape[axis], out_size)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, x.shape[axis] - 1)
        t = (src - lo).astype(jnp.float32)
        xl = jnp.take(x, lo, axis=axis)
        xh = jnp.take(x, hi, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        t = t.reshape(shape)
        return xl * (1 - t) + xh * t

    return interp(interp(x, 1, out_h), 2, out_w)


def _minmax_norm(x: jax.Array) -> jax.Array:
    """Per-image spatial min/max renormalization (ADISTS.py:84-90)."""
    mn = x.min(axis=(1, 2), keepdims=True)
    mx = x.max(axis=(1, 2), keepdims=True)
    return (x - mn) / (mx - mn + _C0)


def _channel_blocks(arrs: Sequence[jax.Array], block: int):
    """Stack NHWC arrays into (num_blocks, N, H, W, block) with zero
    padding on the channel axis (zero channels contribute zero to every
    blocked reduction below)."""
    c = arrs[0].shape[-1]
    nb = -(-c // block)
    pad = nb * block - c
    out = []
    for a in arrs:
        n, h, w, _ = a.shape
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad)))
        out.append(jnp.moveaxis(a.reshape(n, h, w, nb, block), 3, 0))
    return out


def windowed_gamma_sum(f: jax.Array, window_size: int, precision,
                       block: int) -> jax.Array:
    """Channel-blocked windowed var/mean ratio SUM over channels,
    (N,H,W,C) -> (N,Hk,Wk,1): scans channel blocks so only ``block``
    channels of VALID moment maps are ever live. Zero-padded channels
    contribute exactly zero (0/(0+eps)). Callers divide by the true
    channel count (which may differ from C under channel sharding)."""
    n, h, w, c = f.shape
    (fb,) = _channel_blocks([f], block)
    hk, wk = h - window_size + 1, w - window_size + 1

    def body(carry, fk):
        m = window_mean(fk, window_size, precision=precision)
        v = window_mean(fk * fk, window_size, precision=precision) \
            - jnp.square(m)
        return carry + (v / (m + _C0)).sum(axis=-1), None

    tot, _ = jax.lax.scan(body, jnp.zeros((n, hk, wk), jnp.float32), fb)
    return tot[..., None]


def _prob_update(gamma: jax.Array, ps_prod: jax.Array,
                 fits: bool) -> jax.Array:
    """One coarse->fine step of the ps probability cascade
    (ADISTS.py:78-97): sigmoid-normalized gamma, min/max renorm,
    multiplied into the bilinear-upsampled running product. Returns the
    new cascaded product — which IS the stage's ps map. Stages too small
    for the window (``fits=False``) use plain sigmoid(gamma) and no
    renorm (the reference reaches that branch via try/except)."""
    if fits:
        g_mean = gamma.mean(axis=(1, 2), keepdims=True)
        # torch .std() default is unbiased (ddof=1) — ADISTS.py:83
        g_std = gamma.std(axis=(1, 2), keepdims=True, ddof=1)
        ps = jax.nn.sigmoid((gamma - g_mean) / (g_std + _C0))
        ps = _minmax_norm(ps)
        hk, wk = ps.shape[1], ps.shape[2]
        return _minmax_norm(ps * _resize_align_corners(ps_prod, hk, wk))
    ps = jax.nn.sigmoid(gamma)
    return ps * _resize_align_corners(ps_prod, 1, 1)


def compute_prob(feats: Sequence[jax.Array], window_size: int = 21,
                 precision=None, block_pixels: int = 448 * 448,
                 channel_block: int = 16) -> list[jax.Array]:
    """Per-stage structure probability maps ps (ADISTS.py:71-100),
    cascaded coarse -> fine. Returns one (N, Hk, Wk, 1) map per stage."""
    ps_list: list[jax.Array] = []
    ps_prod = jnp.ones(feats[0].shape[:3] + (1,), jnp.float32)
    for k in range(len(feats) - 1, -1, -1):
        f = feats[k].astype(jnp.float32)
        n, h, w, c = f.shape
        fits = fits_window(h, w, window_size)
        if fits:
            if h * w > block_pixels:
                gamma = windowed_gamma_sum(f, window_size, precision,
                                           channel_block) / c
            else:
                x_mean = window_mean(f, window_size, precision=precision)
                x_var = window_mean(f * f, window_size,
                                    precision=precision) - jnp.square(x_mean)
                gamma = (x_var / (x_mean + _C0)).mean(axis=-1, keepdims=True)
        else:
            x_mean = f.mean(axis=(1, 2), keepdims=True)
            x_var = jnp.square(f - x_mean).mean(axis=(1, 2), keepdims=True)
            gamma = (x_var / (x_mean + _C0)).mean(axis=-1, keepdims=True)
        ps_prod = _prob_update(gamma, ps_prod, fits)
        ps_list.append(ps_prod)
    return ps_list[::-1]


def _spatial_l2_normalize(f: jax.Array) -> jax.Array:
    """F.normalize(..., dim=(2,3)) over NCHW == per-(image,channel) L2
    over the spatial plane (ADISTS.py:166-167)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=(1, 2), keepdims=True))
    return f / jnp.maximum(norm, 1e-12)


def _stage_moments_blocked(f: jax.Array, g: jax.Array, inv_x: jax.Array,
                           inv_y: jax.Array, wk: jax.Array,
                           window_size: int, precision,
                           block: int) -> tuple[jax.Array, jax.Array,
                                                jax.Array]:
    """Fused channel-blocked scan over RAW feature blocks returning
    ``(gamma_sum, t_sum, s_sum)``, each (N, Hk, Wk):

    * gamma_sum — Σ_c windowed var/mean of the raw features (the ps
      cascade's input; divide by the true channel count),
    * t_sum / s_sum — Σ_c T_c·w_c and Σ_c S_c·w_c of the L2-normalized
      features (normalization is a per-channel scalar, applied to the
      raw moments inside the scan).

    Because ps broadcasts over channels, the stage distortion map
    factorizes as d = (1-ps)·t_sum + ps·s_sum — so ONE scan serves both
    the gamma and T/S pipelines with five windowed moments per block
    instead of the seven of windowed_gamma_sum + _stage_dmap_blocked.
    Zero-padded channels contribute 0 to gamma (0/(0+eps)) and T=S=1
    with weight 0 to the sums."""
    n, h, w, c = f.shape
    fb, gb, ixb, iyb = _channel_blocks([f, g, inv_x, inv_y], block)
    nb = fb.shape[0]
    pad = nb * block - c
    wkb = jnp.moveaxis(
        jnp.pad(wk, ((0, 0), (0, pad))).reshape(n, nb, block), 1, 0
    )
    hk, wk_out = h - window_size + 1, w - window_size + 1

    def body(carry, inp):
        fk, gk, ixk, iyk, wkk = inp
        gsum, tsum, ssum = carry
        wf = window_mean(fk, window_size, precision=precision)
        wg = window_mean(gk, window_size, precision=precision)
        vf = window_mean(fk * fk, window_size, precision=precision) \
            - jnp.square(wf)
        vg = window_mean(gk * gk, window_size, precision=precision) \
            - jnp.square(wg)
        cov = window_mean(fk * gk, window_size, precision=precision) \
            - wf * wg
        gsum = gsum + (vf / (wf + _C0)).sum(axis=-1)
        xm, ym = ixk * wf, iyk * wg
        xv = jnp.square(ixk) * vf
        yv = jnp.square(iyk) * vg
        xy = ixk * iyk * cov
        t = (2 * xm * ym + 1e-6) / (jnp.square(xm) + jnp.square(ym) + 1e-6)
        s = (2 * xy + 1e-6) / (xv + yv + 1e-6)
        wkk = wkk[:, None, None, :]
        return (gsum, tsum + (t * wkk).sum(axis=-1),
                ssum + (s * wkk).sum(axis=-1)), None

    zero = jnp.zeros((n, hk, wk_out), jnp.float32)
    (gsum, tsum, ssum), _ = jax.lax.scan(
        body, (zero, zero, zero), (fb, gb, ixb, iyb, wkb)
    )
    return gsum, tsum, ssum


def channel_entropy(f: jax.Array) -> jax.Array:
    """Raw per-channel Shannon entropies (bits), (N,H,W,C) -> (N,C):
    spatially L2-normalized ReLU features -> distribution over pixels ->
    entropy (ADISTS.py:127-133). All-zero (padded) channels yield 0."""
    f = _spatial_l2_normalize(jax.nn.relu(f.astype(jnp.float32)))
    n, h, w, c = f.shape
    flat = f.reshape(n, h * w, c)
    flat = flat / (flat.sum(axis=1, keepdims=True) + _C0)
    return jnp.sum(-flat * jnp.log2(flat + _C0), axis=1)


def entropy_weights(f: jax.Array) -> jax.Array:
    """Per-channel entropy weights (ADISTS.py:127-135): raw entropies,
    per-image channel-normalized, scaled by C."""
    ent = channel_entropy(f)
    ent = ent / (ent.sum(axis=1, keepdims=True) + _C0)
    return ent * f.shape[-1]


def forward(
    vgg_params,
    x: jax.Array,
    y: jax.Array,
    cfg: ADISTSConfig = ADISTSConfig(),
    as_loss: bool = True,
    as_map: bool = False,
):
    """ADISTS forward on NHWC batches in [0,1] (ADISTS.py:137-197)."""
    if x.shape != y.shape:
        raise ValueError(
            f"ADISTS requires identically shaped inputs, got {x.shape} vs {y.shape}"
        )
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    n = x.shape[0]
    both = vgg16_pyramid(
        vgg_params, jnp.concatenate([x, y], axis=0), compute_dtype=compute_dtype
    )
    feats_x = [f[:n] for f in both]
    feats_y = [f[n:] for f in both]

    # serving fast path: bf16-grade MXU matmuls for the windowed stats
    serving = cfg.compute_dtype == "bfloat16"
    wprec = jax.lax.Precision.DEFAULT if serving else None

    # entropy channel weights, clamped to mean +- 0.5 std (ADISTS.py:152-160)
    weight = jnp.concatenate([entropy_weights(f) for f in feats_x], axis=1)
    weight = weight / weight.sum(axis=1, keepdims=True)
    w_mean = weight.mean(axis=1, keepdims=True)
    w_std = jnp.sqrt(jnp.square(weight - w_mean).mean(axis=1, keepdims=True))
    weight = jnp.clip(weight, w_mean - 0.5 * w_std, w_mean + 0.5 * w_std)
    weight = weight / weight.sum(axis=1, keepdims=True)

    chns = [f.shape[-1] for f in feats_x]
    offsets = [0]
    for c in chns:
        offsets.append(offsets[-1] + c)

    # fused Pallas T/S kernel (ops/pallas/windowed_tsd): OFF by default —
    # measured SLOWER than the banded-MXU formulation at 256² on v5e
    # (336 vs 425 fr/s): the VPU 21-tap pass loses to the MXU's
    # waste-tolerant dense band matmuls, and the XLA path is
    # bandwidth-bound, not pass-count-bound, at these sizes. Kept as an
    # opt-in reference formulation (fused_tsd=True).
    fused_tsd = bool(cfg.fused_tsd)

    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    d_total = jnp.zeros((B,), jnp.float32)
    d_map_full = jnp.zeros((B, H, W), jnp.float32)

    # Single coarse->fine loop: the ps probability cascade and the T/S
    # statistics iterate stages in the same order, and spatial L2
    # normalization (F.normalize over the plane, ADISTS.py:166-167) is a
    # per-(image,channel) SCALAR — so each stage's five raw windowed
    # moments (Wf, Wg, Wf², Wg², Wfg) are computed ONCE and serve both
    # gamma (raw-feature var/mean, compute_prob's input) and the
    # normalized T/S moments (scaled by the L2 norms afterwards). This
    # replaces the former 7 windowed passes per stage (2 in compute_prob
    # + 5 on pre-normalized features) with 5, fed with bf16 operands in
    # serving mode.
    ps_prod = jnp.ones(feats_x[0].shape[:3] + (1,), jnp.float32)
    for k in range(len(chns) - 1, -1, -1):
        f_raw, g_raw = feats_x[k], feats_y[k]
        h, w, c = f_raw.shape[1], f_raw.shape[2], f_raw.shape[3]
        fits = fits_window(h, w, cfg.window_size)
        wk_weights = weight[:, offsets[k]:offsets[k + 1]]
        f32 = f_raw.astype(jnp.float32)
        g32 = g_raw.astype(jnp.float32)
        # inverse spatial L2 norms, (N,1,1,C) — fp32 accumulation
        inv_x = 1.0 / jnp.maximum(
            jnp.sqrt(jnp.sum(jnp.square(f32), axis=(1, 2), keepdims=True)),
            1e-12,
        )
        inv_y = 1.0 / jnp.maximum(
            jnp.sqrt(jnp.sum(jnp.square(g32), axis=(1, 2), keepdims=True)),
            1e-12,
        )

        if fused_tsd and fits:
            from nerf_qa_tpu.ops.pallas.windowed_tsd import (
                fits_kernel,
                windowed_tsd,
            )

            if fits_kernel(h, w, cfg.window_size):
                wf = window_mean(f32, cfg.window_size, precision=wprec)
                vf = window_mean(f32 * f32, cfg.window_size,
                                 precision=wprec) - jnp.square(wf)
                gamma = (vf / (wf + _C0)).mean(axis=-1, keepdims=True)
                ps_prod = _prob_update(gamma, ps_prod, True)
                d_map = windowed_tsd(f32 * inv_x, g32 * inv_y, ps_prod,
                                     wk_weights, cfg.window_size)
                if as_map:
                    d_map_full = d_map_full + resize_bilinear(
                        d_map[..., None], H, W
                    )[..., 0]
                d_total = d_total + d_map.mean(axis=(1, 2))
                continue
        if fits and h * w > cfg.block_pixels_threshold:
            # full-resolution path: one fused channel-blocked scan (see
            # _stage_moments_blocked) — 1080p stage maps never
            # materialize at full channel width, and the gamma and T/S
            # pipelines share each block's five windowed moments
            gsum, tsum, ssum = _stage_moments_blocked(
                f32, g32, inv_x, inv_y, wk_weights, cfg.window_size,
                wprec, cfg.channel_block,
            )
            ps_prod = _prob_update(gsum[..., None] / c, ps_prod, True)
            ps_k = ps_prod[..., 0]
            d_map = (1.0 - ps_k) * tsum + ps_k * ssum
            if as_map:
                d_map_full = d_map_full + resize_bilinear(
                    d_map[..., None], H, W
                )[..., 0]
            d_total = d_total + d_map.mean(axis=(1, 2))
            continue
        if fits:
            # Five shared raw fp32 moment maps. The maps must stay fp32:
            # var/cov come from cancelling subtractions (W(f²) - W(f)²)
            # whose local-mean² term dominates the local variance in
            # smooth regions, and the ps cascade's min/max
            # renormalization turns a single window's map rounding into
            # a coherent whole-map shift — bf16 maps were measured at
            # ~5e-3 score error (vs ~1e-5 for this formulation), and
            # GLOBAL-mean-shifted bf16 maps (var/cov are shift-
            # invariant) still err 6.6e-3: the cancellation is driven
            # by regional offsets from the global mean, not the DC
            # component, so the shift cannot remove it. The shifted
            # variant also only measured +13% (551 -> 624 fr/s at
            # B=128) — the stats are not purely map-traffic-bound.
            # Serving keeps its speed from DEFAULT-precision matmuls
            # (bf16 operand rounding inside the MXU averages over the
            # 21 taps) and from the 7->5 window-pass sharing.
            wf = window_mean(f32, cfg.window_size, precision=wprec)
            wg = window_mean(g32, cfg.window_size, precision=wprec)
            vf = window_mean(f32 * f32, cfg.window_size,
                             precision=wprec) - jnp.square(wf)
            vg = window_mean(g32 * g32, cfg.window_size,
                             precision=wprec) - jnp.square(wg)
            cov_raw = window_mean(f32 * g32, cfg.window_size,
                                  precision=wprec) - wf * wg
            gamma = (vf / (wf + _C0)).mean(axis=-1, keepdims=True)
            ps_prod = _prob_update(gamma, ps_prod, True)
            x_mean, y_mean = inv_x * wf, inv_y * wg
            x_var = jnp.square(inv_x) * vf
            y_var = jnp.square(inv_y) * vg
            xy_cov = inv_x * inv_y * cov_raw
        else:
            mf = f32.mean(axis=(1, 2), keepdims=True)
            mg = g32.mean(axis=(1, 2), keepdims=True)
            vf = jnp.square(f32 - mf).mean(axis=(1, 2), keepdims=True)
            vg = jnp.square(g32 - mg).mean(axis=(1, 2), keepdims=True)
            cov_raw = (f32 * g32).mean(axis=(1, 2), keepdims=True) - mf * mg
            gamma = (vf / (mf + _C0)).mean(axis=-1, keepdims=True)
            ps_prod = _prob_update(gamma, ps_prod, False)
            x_mean, y_mean = inv_x * mf, inv_y * mg
            x_var = jnp.square(inv_x) * vf
            y_var = jnp.square(inv_y) * vg
            xy_cov = inv_x * inv_y * cov_raw

        ps = ps_prod  # (N, hk, wk, 1), broadcasts over channels
        t_map = (2 * x_mean * y_mean + 1e-6) / (
            jnp.square(x_mean) + jnp.square(y_mean) + 1e-6
        )
        s_map = (2 * xy_cov + 1e-6) / (x_var + y_var + 1e-6)

        pt = 1.0 - ps
        wk_slice = wk_weights[:, None, None, :]
        d_map = ((pt * t_map + ps * s_map) * wk_slice).sum(axis=-1)  # (N,h,w)
        if as_map:
            d_map_full = d_map_full + resize_bilinear(
                d_map[..., None], H, W
            )[..., 0]
        d_total = d_total + d_map.mean(axis=(1, 2))

    if as_map:
        return 1.0 - d_map_full
    if as_loss:
        return 1.0 - d_total.mean()
    return 1.0 - d_total


def forward_once(vgg_params, x: jax.Array,
                 cfg: ADISTSConfig = ADISTSConfig()) -> list[jax.Array]:
    """Feature pyramid (ADISTS.py:112-125); identical to the DISTS one."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return vgg16_pyramid(vgg_params, x, compute_dtype=compute_dtype)
