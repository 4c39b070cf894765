"""Offline NR encoder-feature cache (reference model.py:165-196).

Covers the packed token store round-trip, the cache-builder CLI on a
synthetic NR tree, and equivalence of the cached-token train/score paths
with the direct (ViT-forward) paths.
"""
import os

import jax
import numpy as np
import pandas as pd
import pytest

from nerf_qa_tpu.config import NRModelConfig
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.data.feature_cache import (
    TokenCacheReader,
    token_cache_path,
    write_token_cache,
)
from nerf_qa_tpu.models.nr.model import NRModel
from nerf_qa_tpu.models.nr.vit import ViTS14

R256, R224 = 64, 56


def test_cache_roundtrip(tmp_path):
    df = pd.DataFrame({
        "render_dir": ["chair/nerfacto/color", "drums/ngp/color"],
    })
    t0 = np.random.default_rng(0).random((4, 4, 4, 8), np.float32)
    t1 = np.random.default_rng(1).random((3, 4, 4, 8), np.float32)
    write_token_cache(token_cache_path(str(tmp_path), df["render_dir"][0]),
                      t0, [f"{i:03d}.png" for i in range(4)])
    reader = TokenCacheReader(str(tmp_path), df)
    assert reader.coverage() == (1, 2)
    write_token_cache(token_cache_path(str(tmp_path), df["render_dir"][1]),
                      t1, [f"{i:03d}.png" for i in range(3)])
    assert reader.coverage() == (2, 2)
    got = reader.gather(np.array([1, 0, 0]), np.array([2, 0, 3]))
    assert got.shape == (3, 4, 4, 8) and got.dtype == np.float32
    np.testing.assert_allclose(got[0], t1[2].astype(np.float16), atol=0)
    np.testing.assert_allclose(got[1], t0[0].astype(np.float16), atol=0)
    np.testing.assert_allclose(got[2], t0[3].astype(np.float16), atol=0)


@pytest.fixture(scope="module")
def tiny_model():
    vgg = init_vgg16_params(seed=0)
    return NRModel(
        vgg,
        cfg=NRModelConfig(transformer_decoder_depth=0, refine_up_depth=1,
                          dropout_rate=0.0),
        render_size=R256, sem_size=R224, vit=ViTS14(depth=1),
    )


def _tokens(model, sem_input):
    out = model.vit.apply({"params": model.vit_params}, sem_input)
    gh, gw = out["grid"]
    return np.asarray(
        out["x_norm_patchtokens"].reshape(sem_input.shape[0], gh, gw, -1),
        np.float16,
    )


@pytest.mark.slow
def test_cached_forward_matches_direct(tiny_model):
    rng = np.random.default_rng(0)
    r256 = rng.random((2, R256, R256, 3), np.float32)
    r224 = rng.random((2, R224, R224, 3), np.float32)
    params, state = tiny_model.init(seed=0)
    direct = np.asarray(tiny_model.forward(params, r256, r224, state=state))
    toks = _tokens(tiny_model, r224).astype(np.float32)
    cached = np.asarray(
        tiny_model.forward(params, r256, r224, state=state, sem_tokens=toks)
    )
    # fp16 token storage is the only divergence source
    np.testing.assert_allclose(cached, direct, atol=2e-3)


@pytest.mark.slow
def test_cached_losses_and_train_step(tiny_model):
    from nerf_qa_tpu.config import TrainConfig
    from nerf_qa_tpu.train.nr_train import NRTrainer

    rng = np.random.default_rng(1)
    gt = rng.random((2, R256, R256, 3), np.float32)
    r256 = np.clip(gt + rng.normal(0, 0.05, gt.shape).astype(np.float32), 0, 1)
    r224 = rng.random((2, R224, R224, 3), np.float32)
    toks = _tokens(tiny_model, r224).astype(np.float32)

    trainer = NRTrainer(tiny_model, TrainConfig(batch_size=2),
                        steps_per_epoch=1)
    params, state, opt_state, key = trainer.init()
    p1, s1, o1, losses, key = trainer.train_step(
        params, state, opt_state, gt, r256, r224, key, sem_tokens=toks
    )
    assert np.isfinite(float(losses["combined"]))
    # scoring path
    scores = trainer.score_frames(p1, s1, r256, r224, sem_tokens=toks)
    direct = trainer.score_frames(p1, s1, r256, r224)
    np.testing.assert_allclose(scores, direct, atol=2e-3)


def test_cache_builder_cli(tmp_path):
    from nerf_qa_tpu.tools.cache_nr_features import main as cache_main
    from nerf_qa_tpu.tools.make_synthetic_dataset import make_nr_tree

    data = str(tmp_path / "nr")
    csv = make_nr_tree(data, scenes=("chair",), methods=("nerfacto",),
                       frames=3, hw=(64, 80))
    cache_dir = str(tmp_path / "cache")
    cache_main([
        "--data-dir", data, "--scores-csv", csv, "--cache-dir", cache_dir,
        "--batch-size", "2", "--sem-size", str(R224), "--vit-depth", "1",
        "--num-workers", "0",
    ])
    df = pd.read_csv(csv)
    reader = TokenCacheReader(cache_dir, df)
    assert reader.coverage() == (1, 1)
    toks = reader.gather(np.array([0, 0, 0]), np.array([0, 1, 2]))
    assert toks.shape == (3, R224 // 14, R224 // 14, 384)
    assert np.isfinite(toks).all()
    # idempotent skip: second run leaves the cache intact
    mtime = os.path.getmtime(
        token_cache_path(cache_dir, df["render_dir"][0])
    )
    cache_main([
        "--data-dir", data, "--scores-csv", csv, "--cache-dir", cache_dir,
        "--batch-size", "2", "--sem-size", str(R224), "--vit-depth", "1",
        "--num-workers", "0",
    ])
    assert os.path.getmtime(
        token_cache_path(cache_dir, df["render_dir"][0])
    ) == mtime
