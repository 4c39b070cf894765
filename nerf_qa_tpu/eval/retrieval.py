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
