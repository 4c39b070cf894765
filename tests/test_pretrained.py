"""Pretrained-backbone resolution: driver flags, env fallbacks, torch
checkpoint conversion paths, and the skip-marked golden 0.3347 check."""
import argparse
import os

import numpy as np
import pytest

from nerf_qa_tpu.compat.pretrained import (
    ENV_VGG,
    add_backbone_args,
    resolve_dists_weights,
    resolve_jbu_params,
    resolve_vgg_params,
    resolve_vit_params,
)
from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core.vgg import VGG16_STAGES


def test_backbone_args_parse():
    p = argparse.ArgumentParser()
    add_backbone_args(p)
    args = p.parse_args([
        "--vgg-ckpt", "/x/vgg.pth", "--dists-weights", "/x/w.pt",
        "--vit-ckpt", "/x/vit.pth", "--jbu-ckpt", "/x/jbu.pth",
    ])
    assert args.vgg_ckpt == "/x/vgg.pth"
    assert args.dists_weights == "/x/w.pt"
    assert args.vit_ckpt == "/x/vit.pth"
    assert args.jbu_ckpt == "/x/jbu.pth"


def test_resolve_vgg_random_fallback(monkeypatch, capsys):
    monkeypatch.delenv(ENV_VGG, raising=False)
    params = resolve_vgg_params(None, seed=0)
    assert params["stage1"][0]["kernel"].shape == (3, 3, 3, 64)
    assert "RANDOM" in capsys.readouterr().err


def test_resolve_vgg_from_torch_checkpoint(tmp_path):
    import torch

    rng = np.random.default_rng(0)
    state = {}
    idxs = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
    for stage, conv_idxs in zip(VGG16_STAGES, idxs):
        for (cin, cout), i in zip(stage, conv_idxs):
            state[f"features.{i}.weight"] = torch.from_numpy(
                rng.normal(0, 0.01, (cout, cin, 3, 3)).astype(np.float32)
            )
            state[f"features.{i}.bias"] = torch.from_numpy(
                rng.normal(0, 0.01, (cout,)).astype(np.float32)
            )
    path = tmp_path / "vgg16.pth"
    torch.save(state, path)
    params = resolve_vgg_params(str(path))
    # HWIO transposition check on the first conv
    want = state["features.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(params["stage1"][0]["kernel"], want)


def test_resolve_vgg_from_env(tmp_path, monkeypatch):
    import torch

    state = {
        "features.0.weight": torch.zeros(64, 3, 3, 3),
        "features.0.bias": torch.zeros(64),
    }
    # incomplete checkpoint -> converter raises KeyError; proves the env
    # path is taken rather than the random fallback
    path = tmp_path / "bad.pth"
    torch.save(state, path)
    monkeypatch.setenv(ENV_VGG, str(path))
    with pytest.raises(KeyError):
        resolve_vgg_params(None)


def test_resolve_dists_weights_from_torch_pt(tmp_path):
    import torch

    rng = np.random.default_rng(1)
    alpha = rng.random((1, 1475, 1, 1)).astype(np.float32)
    beta = rng.random((1, 1475, 1, 1)).astype(np.float32)
    path = tmp_path / "weights.pt"
    torch.save({"alpha": torch.from_numpy(alpha),
                "beta": torch.from_numpy(beta)}, path)
    w = resolve_dists_weights(DISTSConfig(), str(path))
    np.testing.assert_allclose(np.asarray(w.alpha), alpha.reshape(-1))
    np.testing.assert_allclose(np.asarray(w.beta), beta.reshape(-1))


def test_resolve_vit_and_jbu_none_fallback(monkeypatch, capsys):
    monkeypatch.delenv("NERF_QA_VIT_CKPT", raising=False)
    monkeypatch.delenv("NERF_QA_JBU_CKPT", raising=False)
    assert resolve_vit_params(None) is None
    assert resolve_jbu_params(None) is None
    err = capsys.readouterr().err
    assert "DINOv2" in err and "FeatUp" in err


GOLDEN_READY = bool(os.environ.get(ENV_VGG)) and \
    os.path.exists(os.environ.get("NERF_QA_GOLDEN_REF", "")) and \
    os.path.exists(os.environ.get("NERF_QA_GOLDEN_DIST", ""))


@pytest.mark.skipif(
    not GOLDEN_READY,
    reason="golden check needs $NERF_QA_VGG_CKPT (torchvision vgg16) and "
           "$NERF_QA_GOLDEN_REF/$NERF_QA_GOLDEN_DIST (the reference's "
           "images/r0.png, r1.png) — not downloadable in this environment",
)
def test_golden_0_3347():
    """DISTS(r1, r0) == 0.3347 (DISTS_pt.py:239) with real checkpoints."""
    from nerf_qa_tpu.tools.golden_check import GOLDEN, compute_pair_score

    score = compute_pair_score(
        os.environ["NERF_QA_GOLDEN_REF"], os.environ["NERF_QA_GOLDEN_DIST"]
    )
    assert abs(score - GOLDEN) < 1e-3, score
