"""tools/reeval: re-evaluate FR checkpoints, including reference torch
model.pth files with their embedded frozen VGG (reeval.py:83 semantics)."""
import os

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

from nerf_qa_tpu.tools.make_synthetic_dataset import make_fr_tree  # noqa: E402
from nerf_qa_tpu.tools.reeval import main as reeval_main  # noqa: E402


def _fake_torch_fr_model(path):
    """model_stats.py-layout state dict: linear head + fine-tuned
    alpha/beta + the frozen VGG stages under dists_model.*"""
    from tests.test_nr_torch_converter import _fake_dists_stages

    rng = np.random.default_rng(0)
    sd = {
        "dists_weight": torch.tensor([-6.0]),
        "dists_bias": torch.tensor([5.0]),
        "dists_model.alpha": torch.rand(1, 1475, 1, 1),
        "dists_model.beta": torch.rand(1, 1475, 1, 1),
    }
    sd.update(_fake_dists_stages(rng, "dists_model."))
    torch.save(sd, path)


def test_reeval_torch_model(tmp_path):
    root = str(tmp_path / "data")
    csv = make_fr_tree(root, scenes=("lego", "truck"), methods_per_scene=1,
                       frames=2, hw=(64, 64))
    pth = str(tmp_path / "model.pth")
    _fake_torch_fr_model(pth)
    out_csv = str(tmp_path / "results_reeval.csv")
    reeval_main([
        "--checkpoint", pth, "--data-dir", root, "--scores-csv", csv,
        "--regression-type", "linear", "--compute-dtype", "float32",
        "--batch-size", "4", "--output-csv", out_csv,
    ])
    df = pd.read_csv(out_csv)
    assert len(df) == 2
    assert np.isfinite(df["pred_score"].values).all()
    assert np.isfinite(df["dists_score"].values).all()
