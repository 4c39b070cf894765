"""Full-reference trainer: L1 MOS regression over DISTS scores.

Reference behavior: run_final.py (the canonical FR trainer) — per-fold
GroupKFold-by-scene CV, Adam with epoch-0 warmup + exponential decay,
L1 loss + optional entropy regularization toward the pretrained α/β
distribution, optional per-step weight projection, per-video test loop
feeding the metric logger.

TPU design: one jitted train step (grads over head + α/β only; the VGG
pyramid is frozen and feature extraction is stop-gradiented), optionally
pjit-sharded over a data mesh (gradients all-reduce over ICI implicitly
through the sharded-batch jit). Weight projection is a pure function
applied to params after the optimizer update (an optax-composable
projection, not an in-place mutation).
"""
from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_qa_tpu.config import FRModelConfig, TrainConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.models import fr
from nerf_qa_tpu.parallel import mesh as meshlib
from nerf_qa_tpu.train.schedules import make_schedule


def make_optimizer(
    cfg: TrainConfig,
    steps_per_epoch: int,
    head_lr_scale: float = 1.0,
) -> optax.GradientTransformation:
    """Adam with schedule; per-group LRs via optax.multi_transform
    (the ``get_param_lr`` superset, SURVEY §2 #7)."""
    schedule = make_schedule(cfg, steps_per_epoch)

    if cfg.optimizer in ("sadamw", "schedule_free"):
        # schedule-free AdamW — the reference's 'sadamw' option
        # (run_final.py / run_test2_sf.py use the schedulefree package)
        return optax.contrib.schedule_free_adamw(
            learning_rate=cfg.lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps
        )

    def adam(scale: float):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
            optax.scale_by_learning_rate(
                lambda step: schedule(step) * scale
            ),
        )

    if head_lr_scale == 1.0:
        opt = adam(1.0)
    else:
        opt = optax.multi_transform(
            {"head": adam(head_lr_scale), "dists": adam(1.0)},
            param_labels=fr.param_labels,
        )
    if cfg.grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum_steps)
    return opt


class FRTrainer:
    """Jitted FR training/eval loops over host-provided numpy batches."""

    def __init__(
        self,
        vgg_params,
        model_cfg: FRModelConfig = FRModelConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        steps_per_epoch: int = 100,
        head_lr_scale: float = 1.0,
        mesh=None,
        dists_weights: dists.DISTSWeights | None = None,
        n_stats: int = 0,
        n_scene_types: int = 0,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.mesh = mesh
        self.vgg_params = vgg_params
        self.n_stats = n_stats
        self.n_scene_types = n_scene_types
        self.original_weights = (
            dists_weights if dists_weights is not None
            else dists.load_pretrained_weights(model_cfg.dists)
        )
        self.optimizer = make_optimizer(train_cfg, steps_per_epoch, head_lr_scale)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._dists_step = self._build_dists_step()
        # cached-stats path (jit wrappers are lazy; no compile unless used)
        self._cached_train_step = self._build_cached_train_step()
        self._pair_stats_step = self._build_pair_stats_step()

    # -- step builders ---------------------------------------------------
    def loss_fn(self, params, dist_imgs, ref_imgs, targets,
                sample_weights=None, stats=None, scene_types=None):
        pred, dists_score = fr.forward(
            params, self.vgg_params, dist_imgs, ref_imgs, self.model_cfg,
            stats=stats, scene_types=scene_types,
        )
        return self._pred_loss(params, pred, dists_score, targets,
                               sample_weights)

    def loss_fn_cached(self, params, pair_stats, targets,
                       sample_weights=None, stats=None, scene_types=None):
        """loss_fn over precomputed (5, N, 1475) pair statistics — the
        frozen-pyramid half of DISTS hoisted out of the training loop
        (see fr.forward_from_stats)."""
        pred, dists_score = fr.forward_from_stats(
            params, pair_stats, self.model_cfg,
            stats=stats, scene_types=scene_types,
        )
        return self._pred_loss(params, pred, dists_score, targets,
                               sample_weights)

    def _pred_loss(self, params, pred, dists_score, targets,
                   sample_weights=None):
        err = jnp.abs(pred - targets)
        if sample_weights is not None:
            # per-frame weights, e.g. 1/frame_count so each video
            # contributes equally to the epoch gradient (run.py:138-167)
            l1 = (err * sample_weights).sum() / sample_weights.sum()
        else:
            l1 = err.mean()
        loss = l1
        if self.train_cfg.entropy_loss_coeff:
            loss = loss + self.train_cfg.entropy_loss_coeff * fr.entropy_loss(
                params, self.original_weights, self.model_cfg
            )
        return loss, (pred, dists_score, l1)

    def _build_train_step(self):
        def step(params, opt_state, dist_imgs, ref_imgs, targets,
                 sample_weights, stats, scene_types):
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, dist_imgs, ref_imgs, targets, sample_weights, stats,
                scene_types,
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.train_cfg.project_weights:
                params = dict(
                    params,
                    dists=dists.project_weights(
                        params["dists"], self.model_cfg.dists
                    ),
                )
            return params, opt_state, loss, aux

        donate = (0, 1) if jax.default_backend() == "tpu" else ()
        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            rsh = meshlib.replicated(self.mesh)
            return jax.jit(
                step,
                in_shardings=(rsh, rsh, dsh, dsh, dsh, dsh, dsh, dsh),
                out_shardings=(rsh, rsh, rsh, (dsh, dsh, rsh)),
                donate_argnums=donate,
            )
        return jax.jit(step, donate_argnums=donate)

    def _build_cached_train_step(self):
        def step(params, opt_state, pair_stats, targets,
                 sample_weights, stats, scene_types):
            # cache stores (N, 5, 1475) so the batch axis leads (shards
            # over the data mesh axis); score_from_stats wants (5, N, C)
            (loss, aux), grads = jax.value_and_grad(
                self.loss_fn_cached, has_aux=True
            )(params, pair_stats.transpose(1, 0, 2), targets,
              sample_weights, stats, scene_types)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.train_cfg.project_weights:
                params = dict(
                    params,
                    dists=dists.project_weights(
                        params["dists"], self.model_cfg.dists
                    ),
                )
            return params, opt_state, loss, aux

        donate = (0, 1) if jax.default_backend() == "tpu" else ()
        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            rsh = meshlib.replicated(self.mesh)
            return jax.jit(
                step,
                in_shardings=(rsh, rsh, dsh, dsh, dsh, dsh, dsh),
                out_shardings=(rsh, rsh, rsh, (dsh, dsh, rsh)),
                donate_argnums=donate,
            )
        return jax.jit(step, donate_argnums=donate)

    def _build_pair_stats_step(self):
        """Jitted (dist, ref) image batch -> (5, N, 1475) pooled moments
        (the cacheable frozen-pyramid half of DISTS)."""
        def step(dist_imgs, ref_imgs):
            n = dist_imgs.shape[0]
            both = dists.forward_once(
                self.vgg_params,
                jnp.concatenate([dist_imgs, ref_imgs], axis=0),
                self.model_cfg.dists,
            )
            f0 = [f[:n] for f in both]
            f1 = [f[n:] for f in both]
            return dists.pyramid_stats(f0, f1, self.model_cfg.dists)

        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            sh5 = meshlib.data_sharding(self.mesh, axis=1)
            return jax.jit(step, in_shardings=(dsh, dsh), out_shardings=sh5)
        return jax.jit(step)

    def _build_eval_step(self):
        def step(params, dist_imgs, ref_imgs, stats, scene_types):
            return fr.forward(
                params, self.vgg_params, dist_imgs, ref_imgs, self.model_cfg,
                stats=stats, scene_types=scene_types,
            )

        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            rsh = meshlib.replicated(self.mesh)
            return jax.jit(step, in_shardings=(rsh, dsh, dsh, dsh, dsh),
                           out_shardings=(dsh, dsh))
        return jax.jit(step)

    def _build_dists_step(self):
        """Raw pretrained-DISTS scoring (no head) — used to compute the
        data-driven head-init column when the scores CSV lacks one
        (replaces the constant-filler landmine; prep.py normally
        precomputes it)."""
        def step(dist_imgs, ref_imgs):
            return dists.forward(
                self.vgg_params, self.original_weights, dist_imgs, ref_imgs,
                self.model_cfg.dists,
            )

        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            return jax.jit(step, in_shardings=(dsh, dsh), out_shardings=dsh)
        return jax.jit(step)

    def _stats_or_zeros(self, stats, n: int):
        if stats is not None:
            return jnp.asarray(stats, jnp.float32)
        return jnp.zeros((n, max(self.n_stats, 1)), jnp.float32)

    def _scene_types_or_zeros(self, scene_types, n: int):
        if scene_types is not None:
            return jnp.asarray(scene_types, jnp.int32)
        return jnp.full((n,), -1, jnp.int32)  # -1 = no conditioning

    # -- public API -------------------------------------------------------
    def init(self, train_dists_scores, train_targets):
        params = fr.init_params(
            train_dists_scores, train_targets, self.model_cfg,
            dists_weights=self.original_weights, n_stats=self.n_stats,
            n_scene_types=self.n_scene_types,
        )
        opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            params = meshlib.replicate(self.mesh, params)
            opt_state = meshlib.replicate(self.mesh, opt_state)
        return params, opt_state

    def train_step(self, params, opt_state, dist_imgs, ref_imgs, targets,
                   sample_weights=None, stats=None, scene_types=None):
        targets = jnp.asarray(targets, jnp.float32)
        if sample_weights is None:
            sample_weights = jnp.ones_like(targets)
        return self._train_step(
            params, opt_state,
            jnp.asarray(dist_imgs), jnp.asarray(ref_imgs),
            targets, jnp.asarray(sample_weights, jnp.float32),
            self._stats_or_zeros(stats, targets.shape[0]),
            self._scene_types_or_zeros(scene_types, targets.shape[0]),
        )

    def train_step_cached(self, params, opt_state, pair_stats, targets,
                          sample_weights=None, stats=None, scene_types=None):
        """Train step over cached (N, 5, 1475) pair statistics."""
        targets = jnp.asarray(targets, jnp.float32)
        if sample_weights is None:
            sample_weights = jnp.ones_like(targets)
        return self._cached_train_step(
            params, opt_state, jnp.asarray(pair_stats, jnp.float32),
            targets, jnp.asarray(sample_weights, jnp.float32),
            self._stats_or_zeros(stats, targets.shape[0]),
            self._scene_types_or_zeros(scene_types, targets.shape[0]),
        )

    def build_stats_cache(self, batches: Iterable) -> dict[str, np.ndarray]:
        """One frozen-VGG pass over (dist, ref, target, video_id) batches
        -> {'stats' (N, 5, 1475), 'targets' (N,), 'video_ids' (N,)}.

        Valid whenever the dataset is deterministic (no per-epoch random
        crops): Test2/LargeQA frame pairs. Afterward every training epoch
        costs O(N·1475) on the α/β+head parameters instead of two VGG16
        forward passes per pair per step.

        Dtype note: the cached moments are stored (and the cached score
        computed) in float32 regardless of ``cfg.compute_dtype``. With
        --compute-dtype bfloat16 the pyramid still runs in bf16, but the
        downstream α/β·stats math is fp32 — slightly MORE accurate than
        the image path's end-to-end bf16 score, so the two paths diverge
        by bf16 rounding (~1e-3), not by approximation. The fp32-config
        parity test (tests/test_fr_cached_stats.py) covers exactness."""
        stats_parts, target_parts, vid_parts = [], [], []
        for batch in batches:
            dist_imgs, ref_imgs, targets = batch[:3]
            vids = batch[3] if len(batch) > 3 else np.zeros(len(targets))
            s = self._pair_stats_step(jnp.asarray(dist_imgs),
                                      jnp.asarray(ref_imgs))
            stats_parts.append(np.asarray(s, np.float32).transpose(1, 0, 2))
            target_parts.append(np.asarray(targets, np.float32))
            vid_parts.append(np.atleast_1d(np.asarray(vids)))
        return {
            "stats": np.concatenate(stats_parts, axis=0),
            "targets": np.concatenate(target_parts),
            "video_ids": np.concatenate(vid_parts),
        }

    def train_epoch_cached(self, params, opt_state, cache: dict,
                           order: np.ndarray, batch_size: int,
                           logger=None, scene_of_video=None,
                           stats_of_video=None, scene_type_of_video=None):
        """One epoch over a stats cache in ``order`` (a sampler's index
        sequence into the cache's leading axis)."""
        losses = []
        for lo in range(0, len(order), batch_size):
            idx = order[lo:lo + batch_size]
            vids = cache["video_ids"][idx]
            vstats = None
            if stats_of_video is not None:
                vstats = np.stack([
                    stats_of_video[int(v)] for v in vids
                ]).astype(np.float32)
            stypes = None
            if scene_type_of_video is not None:
                stypes = np.asarray(
                    [scene_type_of_video[int(v)] for v in vids], np.int32
                )
            params, opt_state, loss, aux = self.train_step_cached(
                params, opt_state, cache["stats"][idx],
                cache["targets"][idx], stats=vstats, scene_types=stypes,
            )
            losses.append(float(loss))
            if logger is not None:
                pred, dists_score, _ = aux
                targets = cache["targets"][idx]
                logger.add_entries(
                    {
                        "loss": np.full(len(idx), float(loss)),
                        "mse": np.square(np.asarray(pred) - targets),
                        "pred_score": np.asarray(pred),
                        "mos": targets,
                    },
                    video_ids=vids,
                    scene_ids=np.asarray([
                        (scene_of_video or {}).get(int(v), "?") for v in vids
                    ]),
                )
        return params, opt_state, float(np.mean(losses)) if losses else 0.0

    def compute_dists_scores(self, batches: Iterable) -> dict:
        """Per-video mean pretrained-DISTS scores over a loader (used for
        head init when the CSV lacks a DISTS column)."""
        scores: dict[Any, list] = {}
        for batch in batches:
            dist_imgs, ref_imgs = batch[0], batch[1]
            video_ids = batch[3] if len(batch) > 3 else np.zeros(len(dist_imgs))
            s = self._dists_step(jnp.asarray(dist_imgs), jnp.asarray(ref_imgs))
            for vid, v in zip(np.atleast_1d(np.asarray(video_ids)),
                              np.asarray(s)):
                scores.setdefault(vid.item(), []).append(float(v))
        return {v: float(np.mean(x)) for v, x in scores.items()}

    def train_epoch(
        self,
        params,
        opt_state,
        batches: Iterable,
        logger=None,
    ):
        """One epoch over (dist, ref, target, video_id, scene_id) batches
        (run_final.py:168-229 shape)."""
        losses = []
        for batch in batches:
            dist_imgs, ref_imgs, targets = batch[:3]
            params, opt_state, loss, aux = self.train_step(
                params, opt_state, dist_imgs, ref_imgs, targets
            )
            losses.append(float(loss))
            if logger is not None and len(batch) >= 5:
                pred, dists_score, l1 = aux
                logger.add_entries(
                    {
                        "loss": np.full(len(targets), float(loss)),
                        "mse": np.square(
                            np.asarray(pred) - np.asarray(targets)
                        ),
                        "pred_score": np.asarray(pred),
                        "mos": np.asarray(targets),
                    },
                    video_ids=batch[3],
                    scene_ids=batch[4],
                )
        return params, opt_state, float(np.mean(losses)) if losses else 0.0

    def evaluate(self, params, dist_imgs, ref_imgs, stats=None,
                 scene_types=None):
        return self._eval_step(
            params, jnp.asarray(dist_imgs), jnp.asarray(ref_imgs),
            self._stats_or_zeros(stats, np.shape(dist_imgs)[0]),
            self._scene_types_or_zeros(scene_types, np.shape(dist_imgs)[0]),
        )

    def score_dataloader(self, params, batches: Iterable,
                         stats_of_video=None,
                         scene_type_of_video=None) -> dict:
        """Video-level scoring over an eval loader — the missing
        ``forward_dataloader`` capability (SURVEY §2 #7): per-frame
        forward, concat, then per-video means. ``stats_of_video``:
        optional {video_id: (n_stats,) array} for the stats-conditioned
        head (run_test2_stats.py:195). ``scene_type_of_video``: optional
        {video_id: int} for the scene-type calibration (run_test2.py:218)."""
        preds: dict[Any, list] = {}
        dists_scores: dict[Any, list] = {}
        for batch in batches:
            dist_imgs, ref_imgs = batch[0], batch[1]
            video_ids = batch[3] if len(batch) > 3 else np.zeros(len(dist_imgs))
            stats = None
            if stats_of_video is not None:
                stats = np.stack([
                    stats_of_video[int(v)]
                    for v in np.atleast_1d(np.asarray(video_ids))
                ]).astype(np.float32)
            scene_types = None
            if scene_type_of_video is not None:
                scene_types = np.asarray([
                    scene_type_of_video[int(v)]
                    for v in np.atleast_1d(np.asarray(video_ids))
                ], np.int32)
            pred, ds = self.evaluate(params, dist_imgs, ref_imgs, stats,
                                     scene_types)
            for vid, p, d in zip(
                np.atleast_1d(np.asarray(video_ids)),
                np.asarray(pred),
                np.asarray(ds),
            ):
                preds.setdefault(vid.item(), []).append(float(p))
                dists_scores.setdefault(vid.item(), []).append(float(d))
        return {
            "pred_score": {v: float(np.mean(x)) for v, x in preds.items()},
            "dists_score": {v: float(np.mean(x)) for v, x in dists_scores.items()},
        }


def group_kfold_splits(groups: np.ndarray, n_splits: int = 4, seed: int = 0):
    """Scene-grouped K-fold indices (run_final.py:231-239). Deterministic
    host-side numpy; equivalent to sklearn GroupKFold (greedy size
    balancing by group frequency)."""
    groups = np.asarray(groups)
    uniq, counts = np.unique(groups, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    fold_sizes = np.zeros(n_splits, np.int64)
    fold_of_group = {}
    for gi in order:
        f = int(np.argmin(fold_sizes))
        fold_of_group[uniq[gi]] = f
        fold_sizes[f] += counts[gi]
    folds = np.array([fold_of_group[g] for g in groups])
    for f in range(n_splits):
        test_idx = np.where(folds == f)[0]
        train_idx = np.where(folds != f)[0]
        yield train_idx, test_idx
