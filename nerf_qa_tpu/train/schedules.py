"""LR schedules matching the reference trainers.

* epoch-0 linear warmup then per-epoch exponential decay
  (run_final.py:178-186, 264: warmup across the first epoch's steps,
  then ExponentialLR(gamma) stepped once per epoch)
* warmup + cosine annealing (run_nerf_qa.py variant)
"""
from __future__ import annotations

import optax


def warmup_exponential(
    lr: float, steps_per_epoch: int, epochs: int, gamma: float,
    warmup_epochs: int = 1,
) -> optax.Schedule:
    warmup_steps = max(1, warmup_epochs * steps_per_epoch)

    def schedule(step):
        frac = (step + 1) / warmup_steps
        warm = lr * frac
        epoch = (step - warmup_steps) // steps_per_epoch + 1
        decayed = lr * gamma**epoch
        import jax.numpy as jnp

        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def warmup_cosine(
    lr: float, steps_per_epoch: int, epochs: int, warmup_epochs: int = 1,
) -> optax.Schedule:
    warmup_steps = max(1, warmup_epochs * steps_per_epoch)
    total = max(warmup_steps + 1, epochs * steps_per_epoch)
    return optax.warmup_cosine_decay_schedule(
        init_value=lr / warmup_steps,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=total,
        end_value=0.0,
    )


def make_schedule(cfg, steps_per_epoch: int) -> optax.Schedule:
    if cfg.schedule == "cosine":
        return warmup_cosine(cfg.lr, steps_per_epoch, cfg.epochs, cfg.warmup_epochs)
    if cfg.schedule == "exp":
        return warmup_exponential(
            cfg.lr, steps_per_epoch, cfg.epochs, cfg.gamma, cfg.warmup_epochs
        )
    return lambda step: cfg.lr
