"""Batched frame/video DISTS scoring — the framework's serving path.

Reference behavior: the per-video test loops of run_test2.py:278-297 and
train-nr.py:305-315 (score every frame pair, mean-pool to a video score),
plus the missing-but-called ``model.forward_dataloader`` (SURVEY §2 #7).

TPU design
----------
* One jitted, shape-bucketed step: uint8 NHWC frames -> f32/255 ->
  bilinear resize -> VGG pyramid (bf16 MXU convs by default) -> fused
  statistics -> per-frame scores. Input buffers are donated.
* Optional data-parallel scoring over a mesh: frames are padded to a
  multiple of (batch × n_devices) and sharded on the leading axis; XLA
  inserts no collectives in the hot loop (scores gather at the end).
* Tail frames are masked, never dropped: a video's score is the mean of
  exactly its real frames.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.ops.resize import resize_bilinear, resize_bilinear_aa
from nerf_qa_tpu.parallel import mesh as meshlib


def _prep(frames: jax.Array, out_hw: tuple[int, int] | None, antialias: bool,
          fast: bool = False):
    scale = 1.0 / 255.0 if frames.dtype == jnp.uint8 else 1.0
    if out_hw is not None and (frames.shape[1], frames.shape[2]) != out_hw:
        if antialias:
            return resize_bilinear_aa(frames.astype(jnp.float32) * scale,
                                      out_hw[0], out_hw[1])
        if fast:
            # serving path: bf16 MXU resize with folded normalization
            return resize_bilinear(
                frames, out_hw[0], out_hw[1],
                precision=jax.lax.Precision.DEFAULT,
                compute_dtype=jnp.bfloat16, scale=scale,
            )
        return resize_bilinear(frames, out_hw[0], out_hw[1], scale=scale)
    x = frames.astype(jnp.float32)
    return x * scale if scale != 1.0 else x


def batched_map(fn, arrays, batch_size: int) -> np.ndarray:
    """Run ``fn(*slices) -> (batch_size,)`` over equal-length arrays in
    fixed-shape batches, padding the tail by repeating the last row (so
    one compiled shape serves any N) and unpadding the result. The
    single home of the pad-tail loop (FrameScorer / ADISTS serving /
    NRScorer all route through it)."""
    n = arrays[0].shape[0]
    out = np.empty((n,), np.float32)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        sl = [a[lo:hi] for a in arrays]
        if hi - lo < batch_size:
            pad = batch_size - (hi - lo)
            sl = [np.concatenate([a, np.repeat(a[-1:], pad, 0)])
                  for a in sl]
        out[lo:hi] = np.asarray(fn(*sl))[: hi - lo]
    return out


class FrameScorer:
    """Jitted, shape-bucketed DISTS frame scorer.

    Args:
      vgg_params: pyramid params (compat converter or random init).
      weights: DISTSWeights (pretrained α/β by default).
      cfg: DISTSConfig — compute_dtype='bfloat16' + stats_impl='pallas'
        is the fast serving config; fp32+xla is the parity oracle.
      resize_to: target (H, W) before scoring, or None to score at input
        resolution (full-size mode; shape-bucketed compiles).
      antialias: use the antialiased resizer (prepare_image-like) instead
        of torch-interpolate semantics.
      mesh: optional jax.sharding.Mesh for multi-chip data parallelism.
      spatial: additionally shard frame HEIGHT over the mesh's model axis
        (parallel.spatial halo-exchange pyramid) — the full-resolution
        scoring mode (test2_prep.py full_size policy) at multi-chip scale.
        Requires ``mesh`` with a model axis and ``resize_to=None``; frames
        must satisfy H % (model_axis * 16) == 0, W % 16 == 0.
    """

    def __init__(
        self,
        vgg_params,
        weights: dists.DISTSWeights,
        cfg: DISTSConfig = DISTSConfig(compute_dtype="bfloat16"),
        resize_to: tuple[int, int] | None = (256, 256),
        antialias: bool = False,
        mesh=None,
        spatial: bool = False,
    ):
        if spatial:
            if mesh is None:
                raise ValueError("spatial=True requires a mesh")
            if resize_to is not None:
                raise ValueError(
                    "spatial=True is the full-resolution mode; use "
                    "resize_to=None (resize would cross device slabs)"
                )
        self.vgg_params = vgg_params
        self.weights = weights
        self.cfg = cfg
        self.resize_to = resize_to
        self.antialias = antialias
        self.mesh = mesh
        self.spatial = spatial
        if mesh is not None:
            self.vgg_params = meshlib.replicate(mesh, vgg_params)
            self.weights = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, meshlib.replicated(mesh)), weights
            )
        self._step = self._build_step()

    def _build_step(self):
        fast = self.cfg.compute_dtype == "bfloat16"

        if self.spatial:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from nerf_qa_tpu.parallel.spatial import spatial_dists_forward

            def sstep(vgg_params, weights, dist_frames, ref_frames):
                x = _prep(dist_frames, None, False)
                y = _prep(ref_frames, None, False)
                return spatial_dists_forward(
                    vgg_params, weights, x, y, self.mesh, self.cfg
                )

            fsh = NamedSharding(
                self.mesh, P(meshlib.DATA_AXIS, meshlib.MODEL_AXIS)
            )
            return jax.jit(
                sstep,
                in_shardings=(meshlib.replicated(self.mesh),
                              meshlib.replicated(self.mesh), fsh, fsh),
                out_shardings=meshlib.data_sharding(self.mesh),
                donate_argnums=(2, 3),
            )

        def step(vgg_params, weights, dist_frames, ref_frames):
            x = _prep(dist_frames, self.resize_to, self.antialias, fast)
            y = _prep(ref_frames, self.resize_to, self.antialias, fast)
            return dists.forward(vgg_params, weights, x, y, self.cfg)

        donate = (2, 3)
        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            rsh = meshlib.replicated(self.mesh)
            return jax.jit(
                step,
                in_shardings=(rsh, rsh, dsh, dsh),
                out_shardings=dsh,
                donate_argnums=donate,
            )
        return jax.jit(step, donate_argnums=donate)

    def score_batch(self, dist_frames, ref_frames) -> jax.Array:
        """Per-frame scores for one fixed-shape batch (device arrays ok)."""
        return self._step(self.vgg_params, self.weights,
                          jnp.asarray(dist_frames), jnp.asarray(ref_frames))

    def score_frames(
        self, dist_frames: np.ndarray, ref_frames: np.ndarray,
        batch_size: int = 32,
    ) -> np.ndarray:
        """Score N frame pairs, padding the tail batch (masked out)."""
        if ref_frames.shape[0] != dist_frames.shape[0]:
            raise ValueError("frame count mismatch")
        step = batch_size
        if self.mesh is not None:
            per = self.mesh.shape[meshlib.DATA_AXIS]
            step = meshlib.pad_to_multiple(batch_size, per)
        return batched_map(self.score_batch, (dist_frames, ref_frames),
                           step)

    def score_video(self, dist_frames, ref_frames, batch_size: int = 32) -> float:
        """Video-level score = mean of per-frame scores
        (train-nr.py:314-315 semantics)."""
        return float(self.score_frames(dist_frames, ref_frames, batch_size).mean())

    def score_videos(
        self,
        pairs: Iterable[tuple[np.ndarray, np.ndarray]],
        batch_size: int = 32,
    ) -> list[float]:
        return [self.score_video(d, r, batch_size) for d, r in pairs]
