"""On-device op timing that survives async-dispatch runtimes.

A naive ``for _ in range(N): f(x)`` + ``block_until_ready`` loop
under-reports sub-millisecond ops on remote-attached accelerators (the
dispatch queue drains faster than completions are observed). This
harness runs the N iterations INSIDE one jitted ``lax.fori_loop``, with
a scalar data dependence between iterations so the compiler can neither
hoist the op out of the loop nor overlap/elide iterations — the host
observes exactly one execution whose wall time is N honest runs.

No reference equivalent (the reference never measures kernels); used by
the repo's profiling scripts and perf work.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def bench_op(op: Callable[[jax.Array], jax.Array], x: jax.Array,
             iters: int = 20, warmup: bool = True) -> float:
    """Median-free single-shot timing of ``op`` (array -> array/scalar).

    Returns seconds per iteration. ``op`` must tolerate a tiny relative
    perturbation of its input (the scalar feedback multiplies x by
    ``1 + acc * 1e-30`` — exactly 1.0 in practice, but opaque to XLA).
    """

    @jax.jit
    def loop(x):
        def body(i, acc):
            # cast the perturbation scalar to x's dtype BEFORE the
            # multiply: bf16_array * f32_scalar silently promotes the
            # whole array to fp32, which doubles the measured op's
            # traffic and changes its layout (a real measurement bug
            # this helper once had).
            scale = (1.0 + acc * 1e-30).astype(x.dtype)
            return acc + op(x * scale).astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    if warmup:
        np.asarray(loop(x))  # compile + settle
    t0 = time.perf_counter()
    np.asarray(loop(x))  # blocks on the scalar result
    return (time.perf_counter() - t0) / iters
