"""DISTS perceptual metric — pure-function JAX implementation.

Reference behavior: nerf_qa/DISTS_pytorch/DISTS_pt.py:27-208 (main),
DISTS_pt_original.py:30-138 ('original' weight-norm modes),
DISTS_pt_softmax.py ('softmax' logits parameterization).

score = 1 - Σₖ Σ_c (αₖ_c·S1ₖ_c + βₖ_c·S2ₖ_c) over the 6 pyramid levels,
where per channel c of stage k:
  S1 = (2·x̄·ȳ + c1) / (x̄² + ȳ² + c1)                (texture)
  S2 = (2·cov + c2) / (var_x + var_y + c2)            (structure)
with spatial means/variances/covariance over H×W (DISTS_pt.py:130-148).

TPU design
----------
* Features NHWC; all six stages' statistics are plain channel reductions
  that XLA fuses with the producing convs; an optional Pallas kernel
  (ops/pallas/moments.py) computes the five moments (Σx, Σy, Σx², Σy², Σxy)
  in a single HBM pass for large (full-resolution) feature maps.
* α/β live as flat (1475,) vectors; stage splits are static slices.
* Everything is (params, inputs) -> outputs; no module state, jit-safe.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core.vgg import PYRAMID_CHANNELS, vgg16_pyramid

TOTAL_CHANNELS = sum(PYRAMID_CHANNELS)  # 1475
_STAGE_OFFSETS = np.cumsum([0] + list(PYRAMID_CHANNELS))

_ASSET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "dists_alpha_beta.npz",
)


class DISTSWeights(NamedTuple):
    """Learnable perceptual weights. For variant='softmax' these are logits
    (DISTS_pt_softmax.py:70-78); otherwise raw non-negative weights."""

    alpha: jax.Array  # (1475,)
    beta: jax.Array  # (1475,)


def load_pretrained_weights(cfg: DISTSConfig = DISTSConfig(),
                            path: str | None = None) -> DISTSWeights:
    """Load the bundled pretrained α/β (converted from the reference's
    DISTS_pytorch/weights.pt, see compat/convert_assets.py).

    variant='original': clamp to (lb·ratio, lb) (DISTS_pt_original.py:69-72).
    variant='softmax': store log(clamp(w, 0)+1e-10) logits
    (DISTS_pt_softmax.py:70-78).
    """
    data = np.load(path or _ASSET_PATH)
    return weights_from_arrays(data["alpha"], data["beta"], cfg)


def weights_from_arrays(alpha, beta,
                        cfg: DISTSConfig = DISTSConfig()) -> DISTSWeights:
    """Build DISTSWeights from raw α/β arrays, applying the variant's
    load-time transform (clamps for 'original', logits for 'softmax')."""
    alpha = np.asarray(alpha, np.float32).reshape(-1)
    beta = np.asarray(beta, np.float32).reshape(-1)
    if cfg.variant == "original":
        lb = cfg.weight_lower_bound
        alpha = np.maximum(alpha, lb * cfg.alpha_beta_ratio)
        beta = np.maximum(beta, lb)
    elif cfg.variant == "softmax":
        alpha = np.log(np.maximum(alpha, 0.0) + 1e-10)
        beta = np.log(np.maximum(beta, 0.0) + 1e-10)
    return DISTSWeights(jnp.asarray(alpha), jnp.asarray(beta))


def init_random_weights(seed: int = 0) -> DISTSWeights:
    """Normal(0.1, 0.01) init (DISTS_pt.py:60-61), for tests/no-asset runs."""
    rng = np.random.default_rng(seed)
    return DISTSWeights(
        jnp.asarray(rng.normal(0.1, 0.01, TOTAL_CHANNELS).astype(np.float32)),
        jnp.asarray(rng.normal(0.1, 0.01, TOTAL_CHANNELS).astype(np.float32)),
    )


def normalized_alpha_beta(w: DISTSWeights, cfg: DISTSConfig):
    """Forward-time weight normalization for every variant.

    main:      α/Σ(α,β), β/Σ(α,β)                  (DISTS_pt.py:127-129)
    original:  optional relu, optional detached sum (DISTS_pt_original.py:111-121)
    softmax:   softmax over concat(α,β)             (DISTS_pt_softmax.py:117-121)
    """
    alpha, beta = w.alpha, w.beta
    if cfg.variant == "softmax":
        joint = jax.nn.softmax(jnp.concatenate([alpha, beta]))
        alpha, beta = joint[:TOTAL_CHANNELS], joint[TOTAL_CHANNELS:]
    else:
        tokens = cfg.weight_norm.split("+") if cfg.weight_norm else []
        if "relu" in tokens:
            alpha = jax.nn.relu(alpha)
            beta = jax.nn.relu(beta)
        w_sum = alpha.sum() + beta.sum()
        if "w_sum_detach" in tokens:
            w_sum = jax.lax.stop_gradient(w_sum)
        alpha = alpha / w_sum
        beta = beta / w_sum
    if cfg.detach_beta:
        beta = jax.lax.stop_gradient(beta)
    return alpha, beta


def project_weights(w: DISTSWeights, cfg: DISTSConfig) -> DISTSWeights:
    """Non-negativity projection applied after optimizer steps.

    main/softmax: floor 0 with a 0.02 floor on the 3 RGB channels
    (DISTS_pt.py:82-89). original: floor = weight_lower_bound, α floor
    scaled by alpha_beta_ratio (DISTS_pt_original.py:88-95). Renormalizes
    by the joint sum.
    """
    if cfg.variant == "original":
        lb = jnp.full((TOTAL_CHANNELS,), cfg.weight_lower_bound, jnp.float32)
        alpha = jnp.maximum(w.alpha, lb * cfg.alpha_beta_ratio)
        beta = jnp.maximum(w.beta, lb)
    else:
        lb = jnp.zeros((TOTAL_CHANNELS,), jnp.float32).at[:3].set(0.02)
        alpha = jnp.maximum(w.alpha, lb)
        beta = jnp.maximum(w.beta, lb)
    w_sum = alpha.sum() + beta.sum()
    return DISTSWeights(alpha / w_sum, beta / w_sum)


class StageStats(NamedTuple):
    """Per-stage spatial statistics, each (N, C)."""

    mean_x: jax.Array
    mean_y: jax.Array
    var_x: jax.Array
    var_y: jax.Array
    cov_xy: jax.Array


def stage_stats_xla(fx: jax.Array, fy: jax.Array) -> StageStats:
    """Spatial moments of one feature stage, NHWC -> (N, C) each.

    Matches the torch reduction order exactly (two-pass variance,
    E[xy] - x̄·ȳ covariance; DISTS_pt.py:131-139). bf16 features upcast
    to fp32 inside the reductions (XLA fuses the cast — nothing
    materializes in fp32).
    """
    fx = fx.astype(jnp.float32)
    fy = fy.astype(jnp.float32)
    mean_x = fx.mean(axis=(1, 2))
    mean_y = fy.mean(axis=(1, 2))
    var_x = jnp.square(fx - mean_x[:, None, None, :]).mean(axis=(1, 2))
    var_y = jnp.square(fy - mean_y[:, None, None, :]).mean(axis=(1, 2))
    cov = (fx * fy).mean(axis=(1, 2)) - mean_x * mean_y
    return StageStats(mean_x, mean_y, var_x, var_y, cov)


def pyramid_stats(feats0: Sequence[jax.Array], feats1: Sequence[jax.Array],
                  cfg: DISTSConfig = DISTSConfig()) -> jax.Array:
    """Compute all six stages' statistics, concatenated over channels.

    Returns a (5, N, 1475) array [mean_x, mean_y, var_x, var_y, cov].
    """
    if cfg.stats_impl == "pallas":
        from nerf_qa_tpu.ops.pallas.moments import stage_stats_pallas

        def stats_fn(fx, fy):
            # The fused kernel wins when a stage's feature map is large
            # enough that the single-pass HBM saving beats the kernel
            # launch (measured crossover ~1M pixels on v5e: at 256² inputs
            # XLA is ~1.7x faster end-to-end; at full-res 1080p the fused
            # pass wins on stages 1-2). Tiny-channel stages (C<64) pad to
            # 128 lanes in VMEM — always XLA there.
            if fx.shape[-1] < 64 or fx.shape[1] * fx.shape[2] < 1_000_000:
                return stage_stats_xla(fx, fy)
            return stage_stats_pallas(fx, fy)
    else:
        stats_fn = stage_stats_xla
    per_stage = [stats_fn(fx, fy) for fx, fy in zip(feats0, feats1)]
    return jnp.stack(
        [jnp.concatenate([s[i] for s in per_stage], axis=-1) for i in range(5)]
    )


def score_from_stats(stats: jax.Array, w: DISTSWeights,
                     cfg: DISTSConfig = DISTSConfig()) -> jax.Array:
    """DISTS score from pooled statistics: (5, N, 1475) -> (N,)."""
    mean_x, mean_y, var_x, var_y, cov = stats
    alpha, beta = normalized_alpha_beta(w, cfg)
    s1 = (2.0 * mean_x * mean_y + cfg.c1) / (
        jnp.square(mean_x) + jnp.square(mean_y) + cfg.c1
    )
    s2 = (2.0 * cov + cfg.c2) / (var_x + var_y + cfg.c2)
    dist = (alpha * s1 + beta * s2).sum(axis=-1)
    return 1.0 - dist


def score_from_feats(
    w: DISTSWeights,
    feats0: Sequence[jax.Array],
    feats1: Sequence[jax.Array],
    cfg: DISTSConfig = DISTSConfig(),
    batch_average: bool = False,
) -> jax.Array:
    """Score two precomputed feature pyramids (DISTS_pt.py:181-208).

    This is also the NR models' scoring primitive
    (model_nr_v8.py:245,258-265).
    """
    score = score_from_stats(pyramid_stats(feats0, feats1, cfg), w, cfg)
    return score.mean() if batch_average else score


def forward(
    vgg_params,
    w: DISTSWeights,
    x: jax.Array,
    y: jax.Array,
    cfg: DISTSConfig = DISTSConfig(),
    batch_average: bool = False,
    stop_feature_grad: bool = True,
) -> jax.Array:
    """Full DISTS forward on NHWC image batches in [0, 1]
    (DISTS_pt.py:105-148). ``stop_feature_grad`` mirrors the reference's
    no_grad feature extraction (require_grad=False default)."""
    if x.shape != y.shape:
        raise ValueError(
            f"DISTS requires identically shaped inputs, got {x.shape} vs {y.shape}"
        )
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # Run both images through the pyramid as ONE batch: halves the number
    # of conv ops and doubles the effective MXU batch vs two passes.
    n = x.shape[0]
    both = vgg16_pyramid(
        vgg_params, jnp.concatenate([x, y], axis=0), compute_dtype=compute_dtype
    )
    feats0 = [f[:n] for f in both]
    feats1 = [f[n:] for f in both]
    if stop_feature_grad:
        feats0 = [jax.lax.stop_gradient(f) for f in feats0]
        feats1 = [jax.lax.stop_gradient(f) for f in feats1]
    return score_from_feats(w, feats0, feats1, cfg, batch_average)


def forward_once(vgg_params, x: jax.Array,
                 cfg: DISTSConfig = DISTSConfig()) -> list[jax.Array]:
    """Feature pyramid of one image batch (DISTS_pt.py:91-103)."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return vgg16_pyramid(vgg_params, x, compute_dtype=compute_dtype)
