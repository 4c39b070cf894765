"""No-reference trainer.

Reference behavior: train-nr.py — Adam over the NR decoder only (encoder
frozen), per-epoch loss aggregation (MetricAggregator), periodic test
passes that score whole videos (mean frame score) and correlate against
MOS/DMOS for synthetic ("syn") / real ("tnt") / all subsets
(train-nr.py:270-377), scene-holdout validation split (:231-244).

TPU design: one jitted train step (loss + grads over decoder params +
Adam update); dropout RNG threaded explicitly; optional data-mesh
sharding of the batch axis.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_qa_tpu.config import TrainConfig
from nerf_qa_tpu.logging.metrics import MetricAggregator
from nerf_qa_tpu.models.nr.model import NRModel
from nerf_qa_tpu.parallel import mesh as meshlib
from nerf_qa_tpu.train.schedules import make_schedule


def _donate() -> tuple[int, ...]:
    """Donate (params, state, opt_state) on TPU: the step rebuilds all
    three, so donation halves their HBM residency and skips the copy.
    CPU/interpreters don't implement donation — keep tests warning-free."""
    return (0, 1, 2) if jax.default_backend() == "tpu" else ()


def scene_holdout_split(
    scenes: np.ndarray,
    holdout_scenes: Iterable[str],
    methods: np.ndarray | None = None,
    blacklist_methods: Iterable[str] = (),
):
    """Train/val split by scene with a method blacklist
    (train-nr.py:231-244 semantics). Returns boolean masks."""
    scenes = np.asarray(scenes)
    holdout = set(holdout_scenes)
    val = np.array([s in holdout for s in scenes])
    train = ~val
    if methods is not None and blacklist_methods:
        bad = np.array([m in set(blacklist_methods) for m in np.asarray(methods)])
        train &= ~bad
    return train, val


class NRTrainer:
    def __init__(
        self,
        model: NRModel,
        train_cfg: TrainConfig = TrainConfig(batch_size=4),
        steps_per_epoch: int = 100,
        mesh=None,
    ):
        self.model = model
        self.train_cfg = train_cfg
        self.mesh = mesh
        schedule = make_schedule(train_cfg, steps_per_epoch)
        self.optimizer = optax.adam(
            schedule, b1=train_cfg.beta1, b2=train_cfg.beta2, eps=train_cfg.eps
        )
        # frozen encoder weights ride every step as an ARGUMENT — closed
        # over they become executable constants, bloating the serialized
        # NR programs to 335-368 MB (model.frozen_params docstring)
        self._frozen = (
            meshlib.replicate(mesh, model.frozen_params())
            if mesh is not None else jax.device_put(model.frozen_params())
        )
        self._train_step = self._build_train_step()
        self._score_step = self._build_score_step()
        self._train_step_sm = None  # built lazily (mode='score-map')
        self._train_step_tok = None  # built lazily (--feature-cache)
        self._score_step_tok = None

    def _build_train_step(self, cached_tokens: bool = False):
        """``cached_tokens``: step takes precomputed ViT patch tokens from
        the offline feature cache (data/feature_cache.py) and skips the
        frozen ViT forward (reference model.py:165-196)."""
        model = self.model

        def step(params, state, opt_state, gt, render_256, render_224,
                 rng, score_std, score_mean, frozen, *tok):
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                losses, new_state = model.losses(
                    p, gt, render_256, render_224, rng=sub,
                    score_std=score_std, score_mean=score_mean, state=state,
                    sem_tokens=tok[0] if tok else None, frozen=frozen,
                )
                return losses["combined"], (losses, new_state)

            (_, (losses, state_out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, state_out, opt_state, losses, rng

        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            rsh = meshlib.replicated(self.mesh)
            ins = (rsh, rsh, rsh, dsh, dsh, dsh, rsh, dsh, dsh, rsh)
            if cached_tokens:
                ins = ins + (dsh,)
            return jax.jit(
                step,
                in_shardings=ins,
                out_shardings=(rsh, rsh, rsh, rsh, rsh),
                donate_argnums=_donate(),
            )
        return jax.jit(step, donate_argnums=_donate())

    def _build_train_step_sm(self):
        """Score-map objective step (mode='score-map' batches: gt, render
        dict, decoded -log10 ADISTS map)."""
        model = self.model

        def step(params, state, opt_state, gt, render_256, render_224,
                 score_map, rng, frozen):
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                losses, new_state = model.losses(
                    p, gt, render_256, render_224, rng=sub, state=state,
                    score_map=score_map, frozen=frozen,
                )
                return losses["combined"], (losses, new_state)

            (_, (losses, state_out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, state_out, opt_state, losses, rng

        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            rsh = meshlib.replicated(self.mesh)
            return jax.jit(
                step,
                in_shardings=(rsh, rsh, rsh, dsh, dsh, dsh, dsh, rsh, rsh),
                out_shardings=(rsh, rsh, rsh, rsh, rsh),
                donate_argnums=_donate(),
            )
        return jax.jit(step, donate_argnums=_donate())

    def train_step_score_map(self, params, state, opt_state, gt,
                             render_256, render_224, score_map, rng):
        if self._train_step_sm is None:
            self._train_step_sm = self._build_train_step_sm()
        return self._train_step_sm(
            params, state, opt_state,
            jnp.asarray(gt), jnp.asarray(render_256), jnp.asarray(render_224),
            jnp.asarray(score_map, jnp.float32), rng, self._frozen,
        )

    def _build_score_step(self, cached_tokens: bool = False):
        model = self.model

        def step(params, state, render_256, render_224, frozen, *tok):
            return model.forward(params, render_256, render_224, state=state,
                                 sem_tokens=tok[0] if tok else None,
                                 frozen=frozen)

        if self.mesh is not None:
            dsh = meshlib.data_sharding(self.mesh)
            rsh = meshlib.replicated(self.mesh)
            ins = (rsh, rsh, dsh, dsh, rsh)
            if cached_tokens:
                ins = ins + (dsh,)
            return jax.jit(step, in_shardings=ins, out_shardings=dsh)
        return jax.jit(step)

    def init(self, seed: int | None = None):
        """Returns (params, state, opt_state, rng) — state carries the
        BatchNorm batch_stats of the v1-v6 generations ({} for v7/v8)."""
        params, state = self.model.init(
            seed if seed is not None else self.train_cfg.seed
        )
        opt_state = self.optimizer.init(params)
        rng = jax.random.PRNGKey(self.train_cfg.seed)
        if self.mesh is not None:
            params = meshlib.replicate(self.mesh, params)
            state = meshlib.replicate(self.mesh, state)
            opt_state = meshlib.replicate(self.mesh, opt_state)
        return params, state, opt_state, rng

    def train_step(self, params, state, opt_state, gt, render_256,
                   render_224, rng, score_std=None, score_mean=None,
                   sem_tokens=None):
        n = np.shape(gt)[0]
        if score_std is None:
            score_std = jnp.zeros((n,), jnp.float32)
            score_mean = jnp.zeros((n,), jnp.float32)
        args = (
            params, state, opt_state,
            jnp.asarray(gt), jnp.asarray(render_256), jnp.asarray(render_224),
            rng, jnp.asarray(score_std, jnp.float32),
            jnp.asarray(score_mean, jnp.float32), self._frozen,
        )
        if sem_tokens is not None:
            if self._train_step_tok is None:
                self._train_step_tok = self._build_train_step(
                    cached_tokens=True
                )
            return self._train_step_tok(
                *args, jnp.asarray(sem_tokens, jnp.float32)
            )
        return self._train_step(*args)

    def train_epoch(self, params, state, opt_state, rng, batches: Iterable,
                    aggregator: MetricAggregator | None = None):
        """Batches of (gt_256, render_256, render_224[, ...])
        (train-nr.py:270-296 shape)."""
        for batch in batches:
            gt, r256, r224 = batch[:3]
            params, state, opt_state, losses, rng = self.train_step(
                params, state, opt_state, gt, r256, r224, rng
            )
            if aggregator is not None:
                aggregator.add({k: float(v) for k, v in losses.items()})
        return params, state, opt_state, rng

    def score_frames(self, params, state, render_256, render_224,
                     sem_tokens=None) -> np.ndarray:
        if sem_tokens is not None:
            if self._score_step_tok is None:
                self._score_step_tok = self._build_score_step(
                    cached_tokens=True
                )
            return np.asarray(
                self._score_step_tok(
                    params, state, jnp.asarray(render_256),
                    jnp.asarray(render_224), self._frozen,
                    jnp.asarray(sem_tokens, jnp.float32),
                )
            )
        return np.asarray(
            self._score_step(
                params, state, jnp.asarray(render_256),
                jnp.asarray(render_224), self._frozen,
            )
        )

    def score_video(self, params, state, render_256, render_224,
                    batch_size: int = 4) -> float:
        """Mean frame score over a video (train-nr.py:305-315)."""
        n = render_256.shape[0]
        scores = []
        for lo in range(0, n, batch_size):
            hi = min(lo + batch_size, n)
            r256, r224 = render_256[lo:hi], render_224[lo:hi]
            if hi - lo < batch_size:
                pad = batch_size - (hi - lo)
                r256 = np.concatenate([r256, np.repeat(r256[-1:], pad, 0)])
                r224 = np.concatenate([r224, np.repeat(r224[-1:], pad, 0)])
            s = self.score_frames(params, state, r256, r224)
            scores.append(s[: hi - lo])
        return float(np.concatenate(scores).mean())
