"""Full-reference MOS-regression models.

Reference behavior: nerf_qa/model.py:22-56 (simple linear/sqrt heads) and
nerf_qa/model_stats.py:23-102 (logistic/sqrt/linear heads, entropy
regularization, MOS/DMOS target selection). The superset interface also
provides the per-param-group learning rates and dataloader-level video
scoring that five reference drivers call but whose implementations were
never checked in (SURVEY §2 #7 version-skew note).

Design: the model is a pure function of an explicit param pytree
  {'head': {...}, 'dists': DISTSWeights}
so optax transforms (including per-group LRs and the project-weights
projection) apply cleanly.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nerf_qa_tpu.config import FRModelConfig
from nerf_qa_tpu.core import dists


def _logistic_np(x, b1, b2, b3, b4, sign):
    return (b1 - b2) / (1 + np.exp(sign * (x - b3) / np.abs(b4))) + b2


def init_head_params(
    train_dists_scores: np.ndarray,
    train_targets: np.ndarray,
    cfg: FRModelConfig = FRModelConfig(),
) -> dict[str, jax.Array]:
    """Data-driven head init, matching the reference:

    * logistic: scipy curve_fit of the 4-parameter logistic
      (model_stats.py:33-48), initial guesses from target extrema /
      predictor median+std.
    * sqrt/linear: least-squares line fit (model.py:26-47 uses sklearn
      LinearRegression; plain lstsq is numerically identical).
    """
    x = np.asarray(train_dists_scores, np.float64)
    y = np.asarray(train_targets, np.float64)
    if cfg.regression_type == "logistic":
        from scipy.optimize import curve_fit

        sign = 1.0 if cfg.subjective_score_type == "MOS" else -1.0
        is_mos = cfg.subjective_score_type == "MOS"
        # floor the slope-scale guess/result: near-constant predictors
        # (tiny std) otherwise drive curve_fit to |b4|→0, a step-function
        # head whose gradients vanish everywhere — training never recovers
        b4_floor = max(1e-3 * (np.std(x) + abs(np.median(x))), 1e-6)
        p0 = [
            np.max(y) if is_mos else np.min(y),
            np.min(y) if is_mos else np.max(y),
            np.median(x),
            max(np.std(x), b4_floor),
        ]
        params, _ = curve_fit(
            lambda x, b1, b2, b3, b4: _logistic_np(x, b1, b2, b3, b4, sign),
            x, y, p0=p0, maxfev=20000,
        )
        params[3] = np.sign(params[3] or 1.0) * max(abs(params[3]), b4_floor)
        return {f"b{i + 1}": jnp.asarray([v], jnp.float32)
                for i, v in enumerate(params)}
    if cfg.regression_type == "sqrt":
        x = np.sqrt(x)
    a = np.stack([x, np.ones_like(x)], axis=1)
    coef, *_ = np.linalg.lstsq(a, y, rcond=None)
    return {
        "weight": jnp.asarray([coef[0]], jnp.float32),
        "bias": jnp.asarray([coef[1]], jnp.float32),
    }


def init_params(
    train_dists_scores: np.ndarray,
    train_targets: np.ndarray,
    cfg: FRModelConfig = FRModelConfig(),
    dists_weights: dists.DISTSWeights | None = None,
    n_stats: int = 0,
    n_scene_types: int = 0,
) -> dict[str, Any]:
    """Full trainable pytree: regression head + DISTS α/β (+ optional
    video-stats head extension, run_test2_stats.py:122-135; + optional
    scene-type calibration, run_test2.py:218)."""
    head = init_head_params(train_dists_scores, train_targets, cfg)
    if n_stats > 0:
        head.update(init_stats_head(n_stats))
    if n_scene_types > 0:
        head.update(init_scene_type_head(n_scene_types))
    return {
        "head": head,
        "dists": dists_weights if dists_weights is not None
        else dists.load_pretrained_weights(cfg.dists),
    }


def apply_head(head: dict[str, jax.Array], dists_scores: jax.Array,
               cfg: FRModelConfig) -> jax.Array:
    """Regression head (model_stats.py:71-79)."""
    if cfg.regression_type == "logistic":
        sign = 1.0 if cfg.subjective_score_type == "MOS" else -1.0
        b1, b2, b3, b4 = head["b1"], head["b2"], head["b3"], head["b4"]
        # sigmoid(-z) == 1/(1+exp(z)) but saturates without inf: the
        # naive exp form yields inf/inf = NaN *gradients* once a fold's
        # curve_fit lands on a tiny |b4| (near-constant predictor), which
        # silently NaNs the whole fold after one optimizer step
        z = sign * (dists_scores - b3) / jnp.abs(b4)
        return (b1 - b2) * jax.nn.sigmoid(-z) + b2
    if cfg.regression_type == "sqrt":
        return jnp.sqrt(dists_scores) * head["weight"] + head["bias"]
    return dists_scores * head["weight"] + head["bias"]


def forward(
    params: dict[str, Any],
    vgg_params,
    dist_imgs: jax.Array,
    ref_imgs: jax.Array,
    cfg: FRModelConfig = FRModelConfig(),
    stats: jax.Array | None = None,
    scene_types: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(mos_pred, dists_score) for NHWC image batches
    (model_stats.py:92-102). ``stats``: optional (N, n_stats) per-video
    DISTS statistics features (run_test2_stats.py:195). ``scene_types``:
    optional (N,) int ids conditioning a per-type calibration
    (run_test2.py:218)."""
    dists_scores = dists.forward(
        vgg_params, params["dists"], dist_imgs, ref_imgs, cfg.dists
    )
    pred = apply_head_with_stats(params["head"], dists_scores, stats, cfg)
    pred = apply_scene_type(params["head"], pred, scene_types)
    return pred, dists_scores


def forward_from_stats(
    params: dict[str, Any],
    pair_stats: jax.Array,
    cfg: FRModelConfig = FRModelConfig(),
    stats: jax.Array | None = None,
    scene_types: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(mos_pred, dists_score) from precomputed pair statistics.

    ``pair_stats``: (5, N, 1475) pooled moments from
    ``dists.pyramid_stats`` — the frozen-VGG part of the metric. FR
    training only updates α/β and the regression head, and the DISTS
    score is (statistics ∘ frozen pyramid) followed by the α/β-weighted
    similarity (DISTS_pt.py:122-148), so the expensive half can be
    computed once per frame pair and reused every epoch. Gradients
    w.r.t. α/β and the head are exact; the reference re-runs both VGG16
    passes every step (run_final.py:189)."""
    dists_scores = dists.score_from_stats(pair_stats, params["dists"],
                                          cfg.dists)
    pred = apply_head_with_stats(params["head"], dists_scores, stats, cfg)
    pred = apply_scene_type(params["head"], pred, scene_types)
    return pred, dists_scores


def entropy_loss(
    params: dict[str, Any],
    original: dists.DISTSWeights,
    cfg: FRModelConfig = FRModelConfig(),
) -> jax.Array:
    """Cross-entropy of learned α/β against the pretrained distribution
    (model_stats.py:81-90)."""
    w = params["dists"]
    weights = jnp.concatenate([w.alpha, w.beta])
    norm = cfg.dists.weight_norm
    if cfg.dists.variant == "softmax":
        weights = jax.nn.softmax(weights)
    else:
        if "relu" in (norm.split("+") if norm else []):
            weights = jax.nn.relu(weights)
        weights = weights / weights.sum()
    orig = jnp.concatenate([original.alpha, original.beta])
    return -jnp.sum(orig * jnp.log(weights + 1e-10))


def init_stats_head(n_stats: int = 3) -> dict[str, jax.Array]:
    """Video-statistics-conditioned head extension (run_test2_stats.py:
    122-135,195 feeds per-video DISTS std/min/max alongside the frame
    score): a zero-initialized linear term over the stats features added
    to the base regression output."""
    return {
        "stats_weight": jnp.zeros((n_stats,), jnp.float32),
    }


def apply_head_with_stats(
    head: dict[str, jax.Array],
    dists_scores: jax.Array,
    stats: jax.Array | None,
    cfg: FRModelConfig,
) -> jax.Array:
    """Regression head with optional per-video stats features.

    stats: (N, n_stats) — e.g. [DISTS_std, DISTS_min, DISTS_max] gathered
    per frame's video. None falls back to the plain head."""
    base = apply_head(head, dists_scores, cfg)
    if stats is None or "stats_weight" not in head:
        return base
    return base + stats @ head["stats_weight"]


def init_scene_type_head(n_scene_types: int = 2) -> dict[str, jax.Array]:
    """Scene-type-conditioned calibration head. run_test2.py:218 passes
    ``scene_type=`` into a model version that was never checked in
    (SURVEY §2 #7 version-skew note); the superset interface is a
    per-type affine on the regression output, identity-initialized so
    enabling it is behavior-preserving until trained."""
    return {
        "scene_scale": jnp.ones((n_scene_types,), jnp.float32),
        "scene_bias": jnp.zeros((n_scene_types,), jnp.float32),
    }


def apply_scene_type(
    head: dict[str, jax.Array],
    pred: jax.Array,
    scene_types: jax.Array | None,
) -> jax.Array:
    """Per-scene-type affine calibration of head output; (N,) int ids
    gather the type's (scale, bias). None falls back to the plain head,
    and so does any NEGATIVE id (the trainer's jitted steps can't carry
    None, so -1 is the "no conditioning" sentinel — without it, a
    scene-conditioned checkpoint evaluated without ids would silently
    get the trained type-0 affine applied to every sample)."""
    if scene_types is None or "scene_scale" not in head:
        return pred
    st = scene_types.astype(jnp.int32)
    idx = jnp.maximum(st, 0)
    calibrated = pred * head["scene_scale"][idx] + head["scene_bias"][idx]
    return jnp.where(st >= 0, calibrated, pred)


def param_labels(params: dict[str, Any]) -> dict[str, Any]:
    """Optimizer param-group labels — the ``get_param_lr`` superset
    (run_test2_cross.py:151 calls it; never checked in). 'head' params
    typically train with a larger LR than the DISTS α/β."""
    return {
        "head": jax.tree_util.tree_map(lambda _: "head", params["head"]),
        "dists": jax.tree_util.tree_map(lambda _: "dists", params["dists"]),
    }
