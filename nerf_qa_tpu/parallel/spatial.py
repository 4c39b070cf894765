"""Spatial (H-axis) sharded full-resolution DISTS scoring.

The reference scores full-size 1080p frames on one GPU
(test2_prep.py:199-313 full_size policy); on TPU a single chip runs that
at ~20 fps (PARITY.md). This module scales the full-resolution path
across chips by sharding the image HEIGHT over the mesh's ``model`` axis:

* every 3x3 VGG conv exchanges one-row halos with its H-neighbors via
  ``jax.lax.ppermute`` (devices at the global edges receive zeros — the
  exact SAME-padding semantics), then convolves VALID over H;
* the stride-2 L2 pools exchange a single top halo row (slab heights stay
  even and slab offsets aligned, so pooling windows never straddle
  devices beyond that row);
* DISTS statistics accumulate as per-slab partial sums (Σx, Σy, Σx²,
  Σy², Σxy per channel) and one ``psum`` over the model axis produces the
  global moments — the batch axis remains data-parallel.

Constraints: H must be divisible by (model_axis_size * 16) and W by 16 so
every pyramid level shards evenly (pad frames to e.g. 1088x1920 for
1080p). Variance uses the single-pass E[x²]-E[x]² form (partial sums
compose across devices); fp32 accumulation keeps it within ~1e-5 of the
two-pass single-chip score.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.core.vgg import VGG16_STAGES, normalize_imagenet
from nerf_qa_tpu.ops.l2pool import _hann_kernel
from nerf_qa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _neighbor_rows(rows: jax.Array, axis_name: str, nd: int,
                   direction: int) -> jax.Array:
    """Send ``rows`` to the H-neighbor (direction +1 = down). Devices with
    no sender receive zeros — global SAME zero padding falls out."""
    if direction > 0:
        perm = [(i, i + 1) for i in range(nd - 1)]
    else:
        perm = [(i + 1, i) for i in range(nd - 1)]
    return jax.lax.ppermute(rows, axis_name, perm)


def _conv_relu_spatial(x, kernel, bias, axis_name: str, nd: int,
                       compute_dtype, precision) -> jax.Array:
    """3x3 SAME conv with cross-device H halos (VALID over the haloed H)."""
    x = x.astype(compute_dtype)
    if nd > 1:
        top = _neighbor_rows(x[:, -1:], axis_name, nd, +1)
        bot = _neighbor_rows(x[:, :1], axis_name, nd, -1)
        xh = jnp.concatenate([top, x, bot], axis=1)
        pad_h = (0, 0)
    else:
        xh = x
        pad_h = (1, 1)
    y = jax.lax.conv_general_dilated(
        xh, kernel.astype(compute_dtype), (1, 1),
        padding=(pad_h, (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return jax.nn.relu(y + bias.astype(jnp.float32)).astype(compute_dtype)


def _l2pool_spatial(x, axis_name: str, nd: int, precision) -> jax.Array:
    """L2 pool (3x3 hann², stride 2, pad 1) with a single top halo row
    (even slab heights keep every pooling window within slab+halo)."""
    c = x.shape[-1]
    sq = jnp.square(x.astype(jnp.float32))
    if nd > 1:
        top = _neighbor_rows(sq[:, -1:], axis_name, nd, +1)
        sqh = jnp.concatenate([top, sq], axis=1)
        pad_h = (0, 0)
    else:
        sqh = sq
        pad_h = (1, 1)
    win = jnp.asarray(_hann_kernel(5))[:, :, None, None] * jnp.ones(
        (1, 1, 1, c), jnp.float32
    )
    out = jax.lax.conv_general_dilated(
        sqh, win, (2, 2), padding=(pad_h, (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return jnp.sqrt(out + 1e-12)


def _pyramid_spatial(params, x, axis_name: str, nd: int, compute_dtype,
                     precision) -> list[jax.Array]:
    """vgg16_pyramid with halo-exchanged convs/pools (slab-local NHWC)."""
    feats = [x.astype(compute_dtype)]
    h = normalize_imagenet(x.astype(jnp.float32))
    for si in range(5):
        if si > 0:
            h = _l2pool_spatial(h, axis_name, nd, precision)
        for layer in params[f"stage{si + 1}"]:
            h = _conv_relu_spatial(h, layer["kernel"], layer["bias"],
                                   axis_name, nd, compute_dtype, precision)
        feats.append(h)
    return feats


def _partial_sums(fx, fy) -> jax.Array:
    """Per-slab [Σx, Σy, Σx², Σy², Σxy] over space -> (5, N, C) fp32."""
    fx = fx.astype(jnp.float32)
    fy = fy.astype(jnp.float32)
    return jnp.stack([
        fx.sum(axis=(1, 2)),
        fy.sum(axis=(1, 2)),
        jnp.square(fx).sum(axis=(1, 2)),
        jnp.square(fy).sum(axis=(1, 2)),
        (fx * fy).sum(axis=(1, 2)),
    ])


def spatial_dists_forward(vgg_params, weights: dists.DISTSWeights,
                          x: jax.Array, y: jax.Array, mesh,
                          cfg: DISTSConfig = DISTSConfig()) -> jax.Array:
    """Full-resolution DISTS pair scores with H sharded over the mesh's
    model axis (batch over the data axis). Returns (N,) scores.

    H must divide by model_axis_size * 16 and W by 16.
    """
    nd = mesh.shape[MODEL_AXIS]
    n, hh, ww, _ = x.shape
    if hh % (nd * 16) or ww % 16:
        raise ValueError(
            f"spatial sharding needs H % {nd * 16} == 0 and W % 16 == 0, "
            f"got {hh}x{ww} (pad the frames, e.g. 1080 -> 1088)"
        )
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    precision = (jax.lax.Precision.HIGHEST
                 if cfg.compute_dtype == "float32"
                 else jax.lax.Precision.DEFAULT)
    # global per-stage pixel counts are static: stage k level size
    counts = []
    for k in range(6):
        s = 2 ** max(k - 1, 0)
        counts.append((hh // s) * (ww // s))

    def run(params, w, xs, ys):
        feats_x = _pyramid_spatial(params, xs, MODEL_AXIS, nd,
                                   compute_dtype, precision)
        feats_y = _pyramid_spatial(params, ys, MODEL_AXIS, nd,
                                   compute_dtype, precision)
        local = jnp.concatenate(
            [_partial_sums(fx, fy) for fx, fy in zip(feats_x, feats_y)],
            axis=-1,
        )  # (5, n_local, 1475)
        total = jax.lax.psum(local, MODEL_AXIS)
        inv = jnp.concatenate([
            jnp.full((c,), 1.0 / cnt, jnp.float32)
            for cnt, c in zip(counts, [f.shape[-1] for f in feats_x])
        ])
        sum_x, sum_y, sum_x2, sum_y2, sum_xy = total
        mean_x = sum_x * inv
        mean_y = sum_y * inv
        var_x = sum_x2 * inv - jnp.square(mean_x)
        var_y = sum_y2 * inv - jnp.square(mean_y)
        cov = sum_xy * inv - mean_x * mean_y
        stats = jnp.stack([mean_x, mean_y, var_x, var_y, cov])
        return dists.score_from_stats(stats, w, cfg)

    sharded = shard_map(
        run, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS, MODEL_AXIS),
                  P(DATA_AXIS, MODEL_AXIS)),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    )
    return sharded(vgg_params, weights, x, y)


def shard_frames_spatial(mesh, batch):
    """Device-put NHWC frames with (batch, H) sharded over (data, model)."""
    sh = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)
