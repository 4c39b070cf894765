"""Pseudo-reference retrieval + certainty-masked DISTS scoring.

Reference behavior: nerf_qa/image_retrieval.py — SIFT bag-of-words
retrieval (KMeans vocabulary, cosine histogram match, :7-61) and RoMa
dense warping of the retrieved reference onto the render with
certainty-masked DISTS pseudo-FR scoring (:144-219). That module is
dead code in the reference (it imports a missing ``nerf_qa.roma``); the
capability is rebuilt here TPU-native:

* Retrieval: instead of CPU SIFT + KMeans, images embed through the
  (already-resident) VGG16 pyramid — per-stage spatial-mean descriptors,
  L2-normalized and concatenated. Cosine similarity over the index is a
  single matmul (MXU). This is both stronger than BoW-SIFT and free of
  the OpenCV dependency.
* Warped scoring: given a dense warp grid (from any matcher) and a
  certainty map, the reference is warped onto the render and DISTS
  statistics are computed with certainty weighting — masked moments, so
  unmatched regions don't perturb means/variances.
* Dense correspondence: ``estimate_warp`` is a native coarse matcher so
  the pipeline runs END-TO-END without RoMa (whose import is what killed
  the reference module): normalized VGG stage features correlate
  all-pairs on the MXU, a temperature-softmax soft-argmax turns each
  query position's correlation row into source coordinates, and the
  correlation peak value becomes the certainty map. ``pseudo_fr_score``
  chains estimate -> warp -> certainty-masked DISTS (the full
  image_retrieval.py:144-219 behavior, alive).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.core.vgg import vgg16_pyramid


def embed_images(vgg_params, images: jax.Array,
                 compute_dtype=jnp.bfloat16) -> jax.Array:
    """(N,H,W,3) -> L2-normalized (N, 1475) pyramid-mean descriptors."""
    feats = vgg16_pyramid(vgg_params, images, compute_dtype=compute_dtype)
    pooled = jnp.concatenate([f.mean(axis=(1, 2)) for f in feats], axis=-1)
    return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


class ImageRetrieval:
    """Cosine-similarity retrieval over a reference image corpus
    (ImageRetrieval.retrieve equivalent, image_retrieval.py:47-61)."""

    def __init__(self, vgg_params, compute_dtype=jnp.bfloat16):
        self.vgg_params = vgg_params
        self.compute_dtype = compute_dtype
        self._embed = jax.jit(
            lambda imgs: embed_images(vgg_params, imgs, compute_dtype)
        )
        self.index: np.ndarray | None = None

    def build_index(self, images: np.ndarray, batch_size: int = 16) -> None:
        chunks = [
            np.asarray(self._embed(jnp.asarray(images[lo:lo + batch_size])))
            for lo in range(0, len(images), batch_size)
        ]
        self.index = np.concatenate(chunks, axis=0)

    def retrieve(self, queries: np.ndarray, k: int = 1):
        """Top-k (indices, similarities) for each query image."""
        if self.index is None:
            raise RuntimeError("build_index first")
        q = np.asarray(self._embed(jnp.asarray(queries)))
        sims = q @ self.index.T  # (Q, N)
        top = np.argsort(-sims, axis=1)[:, :k]
        return top, np.take_along_axis(sims, top, axis=1)


def warp_image(image: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear warp: grid (N,H,W,2) holds source (y, x) pixel coords."""
    n, h, w, c = image.shape
    ys = jnp.clip(grid[..., 0], 0, h - 1)
    xs = jnp.clip(grid[..., 1], 0, w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ty = (ys - y0)[..., None]
    tx = (xs - x0)[..., None]

    def gather(yy, xx):
        batch = jnp.arange(n)[:, None, None]
        return image[batch, yy, xx]

    return (
        gather(y0, x0) * (1 - ty) * (1 - tx)
        + gather(y1, x0) * ty * (1 - tx)
        + gather(y0, x1) * (1 - ty) * tx
        + gather(y1, x1) * ty * tx
    )


def estimate_warp(
    vgg_params,
    render: jax.Array,
    reference: jax.Array,
    stage: int = 3,
    temperature: float = 0.01,
    compute_dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Coarse dense correspondence render -> reference.

    All-pairs cosine correlation of spatially mean-centered,
    L2-normalized VGG ``stage`` features (stride 2^(stage-1)) as ONE
    (Hq·Wq, Hs·Ws) MXU matmul per image, then a temperature-softmax
    soft-argmax over source positions. Mean-centering is load-bearing:
    VGG activations share a large common (DC) component across positions,
    so raw cosine similarities saturate near 1 and the softmax blurs the
    grid; centering restores discriminative peaks (same reason
    normalized cross-correlation subtracts the local mean). Returns
    (grid, certainty): grid (N,H,W,2) holds source (y, x) PIXEL coords
    into ``reference`` for every render pixel (bilinearly upsampled from
    the feature grid, ready for ``warp_image``); certainty (N,H,W) is the
    per-position peak correlation in [~0, 1] (cosine of best match) —
    feed it to ``masked_dists_score``.

    This replaces the reference's RoMa dense-warp dependency
    (image_retrieval.py:94-96, dead import) with a self-contained
    feature-flow matcher; RoMa-grade sub-pixel accuracy is not the goal —
    certainty-masked statistics absorb coarse-match noise.
    """
    n, h, w, _ = render.shape
    stride = 2 ** max(stage - 1, 0)
    both = vgg16_pyramid(
        vgg_params, jnp.concatenate([render, reference]),
        compute_dtype=compute_dtype,
    )
    fq = both[stage][:n].astype(jnp.float32)
    fs = both[stage][n:].astype(jnp.float32)
    hq, wq, c = fq.shape[1], fq.shape[2], fq.shape[3]
    hs, ws = fs.shape[1], fs.shape[2]

    def norm(f):
        f = f - f.mean(axis=(1, 2), keepdims=True)
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)

    q = norm(fq).reshape(n, hq * wq, c)
    s = norm(fs).reshape(n, hs * ws, c)
    corr = jnp.einsum("nqc,nsc->nqs", q, s)  # cosine in [-1, 1]

    # hard argmax + LOCAL 3x3 soft-argmax refinement: a global softmax
    # lets the long tail of distant low-probability cells bias the
    # expectation by O(1) feature cells; restricting the expectation to
    # the peak's neighborhood keeps sub-cell precision without the bias.
    am = jnp.argmax(corr, axis=-1)  # (N, Q) flat source index
    am_y = (am // ws).astype(jnp.int32)
    am_x = (am % ws).astype(jnp.int32)
    offs = jnp.asarray([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                       jnp.int32)  # (9, 2)
    ny = jnp.clip(am_y[..., None] + offs[:, 0], 0, hs - 1)  # (N, Q, 9)
    nx = jnp.clip(am_x[..., None] + offs[:, 1], 0, ws - 1)
    nidx = ny * ws + nx
    local = jnp.take_along_axis(corr, nidx, axis=-1)  # (N, Q, 9)
    p = jax.nn.softmax(local / temperature, axis=-1)
    ref_y = (p * ny).sum(-1)
    ref_x = (p * nx).sum(-1)
    grid_feat = jnp.stack([ref_y, ref_x], axis=-1).reshape(n, hq, wq, 2)
    cert_feat = corr.max(axis=-1).reshape(n, hq, wq)

    # feature-grid coords -> full-res pixel coords (cell centers)
    grid_feat = (grid_feat + 0.5) * stride - 0.5
    grid = jax.image.resize(grid_feat, (n, h, w, 2), "linear")
    certainty = jnp.clip(
        jax.image.resize(cert_feat, (n, h, w), "linear"), 0.0, 1.0
    )
    return grid, certainty


def pseudo_fr_score(
    vgg_params,
    weights: dists.DISTSWeights,
    render: jax.Array,
    reference: jax.Array,
    cfg: DISTSConfig = DISTSConfig(),
    stage: int = 3,
    certainty_threshold: float = 0.0,
) -> jax.Array:
    """End-to-end pseudo-FR scoring of a render against a RETRIEVED (not
    pixel-aligned) reference: estimate_warp -> warp_image ->
    certainty-masked DISTS (image_retrieval.py:144-219, rebuilt alive).
    ``certainty_threshold`` optionally hard-gates low-confidence pixels
    to zero weight."""
    grid, certainty = estimate_warp(vgg_params, render, reference,
                                    stage=stage)
    warped = warp_image(reference, grid)
    if certainty_threshold > 0.0:
        certainty = jnp.where(certainty >= certainty_threshold,
                              certainty, 0.0)
    return masked_dists_score(vgg_params, weights, render, warped,
                              certainty, cfg)


def masked_stage_stats(fx: jax.Array, fy: jax.Array,
                       weight: jax.Array) -> dists.StageStats:
    """Certainty-weighted spatial moments: weight (N,H,W,1) in [0,1]."""
    wsum = weight.sum(axis=(1, 2)) + 1e-8
    mean_x = (fx * weight).sum(axis=(1, 2)) / wsum
    mean_y = (fy * weight).sum(axis=(1, 2)) / wsum
    var_x = (jnp.square(fx - mean_x[:, None, None, :]) * weight).sum(
        axis=(1, 2)) / wsum
    var_y = (jnp.square(fy - mean_y[:, None, None, :]) * weight).sum(
        axis=(1, 2)) / wsum
    cov = (fx * fy * weight).sum(axis=(1, 2)) / wsum - mean_x * mean_y
    return dists.StageStats(mean_x, mean_y, var_x, var_y, cov)


def masked_dists_score(
    vgg_params,
    weights: dists.DISTSWeights,
    render: jax.Array,
    warped_reference: jax.Array,
    certainty: jax.Array,
    cfg: DISTSConfig = DISTSConfig(),
) -> jax.Array:
    """Certainty-masked pseudo-FR DISTS (image_retrieval.py:144-219
    behavior): score only where the warp is confident. certainty:
    (N,H,W) or (N,H,W,1) in [0,1], downscaled per stage by average
    pooling."""
    if certainty.ndim == 3:
        certainty = certainty[..., None]
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    n = render.shape[0]
    both = vgg16_pyramid(
        vgg_params, jnp.concatenate([render, warped_reference]),
        compute_dtype=compute_dtype,
    )
    feats0 = [f[:n] for f in both]
    feats1 = [f[n:] for f in both]
    per_stage = []
    for fx, fy in zip(feats0, feats1):
        h, w = fx.shape[1], fx.shape[2]
        cert = jax.image.resize(certainty, (n, h, w, 1), "linear")
        per_stage.append(masked_stage_stats(fx, fy, cert))
    stats = jnp.stack([
        jnp.concatenate([s[i] for s in per_stage], axis=-1) for i in range(5)
    ])
    return dists.score_from_stats(stats, weights, cfg)
