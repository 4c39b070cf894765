"""Persistent XLA compilation cache for the serving/scoring entry points.

The reference has no cold-start problem — PyTorch eager runs kernels
immediately (run_test2.py:278-297 rebuilds the model per script run and
pays only model-load time). On TPU the equivalent cold start is XLA
compilation: the serve/score pipelines compile for tens of seconds per
shape (the full-size NR forward >10 min), every process, because JAX
ships with no cache directory configured.

Pointing JAX at a persistent on-disk cache turns every repeat compile
into a second-scale deserialization (measured on the v5e harness: the
B=8 NR serving-forward bench rerun dropped from ~20 min of compiles to
~2 min total). The cache is keyed on HLO + compiler version + device
kind, so it is safe across process restarts and stale entries are
simply misses.

Env contract:
  NERF_QA_TPU_COMPILE_CACHE=0       disable
  NERF_QA_TPU_COMPILE_CACHE=<path>  explicit cache directory
  unset                             ~/.cache/nerf_qa_tpu/xla_cache

Drivers opt in by calling ``enable_persistent_cache()`` before the
first jit (serve/score do; one-shot trainers benefit less — their one
long compile amortizes over the run, but train_nr calls it too so
preemption-resume restarts skip recompilation).
"""
from __future__ import annotations

import os


def enable_persistent_cache(min_compile_secs: float = 2.0) -> str | None:
    """Configure JAX's persistent compilation cache; returns the cache
    dir, or None when disabled by env or unsupported by this JAX."""
    setting = os.environ.get("NERF_QA_TPU_COMPILE_CACHE", "")
    if setting == "0":
        return None
    path = setting or os.path.join(
        os.path.expanduser("~"), ".cache", "nerf_qa_tpu", "xla_cache"
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # default threshold (1 s) skips the tiny host-side programs;
        # keep everything the tunnel-attached chip compiles slowly
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except (AttributeError, ValueError):  # older jax without the knobs
        return None
    return path
