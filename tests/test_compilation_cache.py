"""utils/compilation_cache: the serve/score/train_nr cold-start cache.

Checks the env contract (explicit dir / disable) and that a jit actually
populates the cache directory when the threshold admits it.
"""
import os

import jax
import jax.numpy as jnp

from nerf_qa_tpu.utils.compilation_cache import enable_persistent_cache


def _reset():
    jax.config.update("jax_compilation_cache_dir", None)


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("NERF_QA_TPU_COMPILE_CACHE", "0")
    assert enable_persistent_cache() is None


def test_explicit_dir_and_population(monkeypatch, tmp_path):
    cache = tmp_path / "xla"
    monkeypatch.setenv("NERF_QA_TPU_COMPILE_CACHE", str(cache))
    try:
        got = enable_persistent_cache(min_compile_secs=0.0)
        assert got == str(cache)
        assert os.path.isdir(got)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        f(jnp.ones((64, 64))).block_until_ready()
        entries = os.listdir(got)
        assert entries, "jit compile did not populate the cache dir"
    finally:
        _reset()


def test_default_dir_under_home(monkeypatch, tmp_path):
    monkeypatch.delenv("NERF_QA_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    try:
        got = enable_persistent_cache()
        assert got == str(tmp_path / ".cache" / "nerf_qa_tpu" / "xla_cache")
        assert os.path.isdir(got)
    finally:
        _reset()
