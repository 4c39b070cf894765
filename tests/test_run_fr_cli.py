"""run_fr CLI on synthetic fixtures: cross-dataset validation,
stats-conditioned head, and scorer-based head init (the three round-2
FR driver features, run_test2.py:165-167 / run_test2_stats.py:122-135)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from nerf_qa_tpu.tools.make_synthetic_dataset import make_fr_tree
from nerf_qa_tpu.tools.run_fr import main as run_fr_main


@pytest.fixture(scope="module")
def fr_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fr"))
    csv = make_fr_tree(root, scenes=("lego", "truck"), methods_per_scene=2,
                       frames=2, hw=(64, 64))
    df = pd.read_csv(csv)
    df["DISTS_std"] = 0.02
    df["DISTS_min"] = df["DISTS"] - 0.05
    df["DISTS_max"] = df["DISTS"] + 0.05
    df.to_csv(csv, index=False)
    return root, csv


def test_run_fr_stats_head_and_cross_dataset_val(fr_tree, tmp_path):
    root, csv = fr_tree
    out = str(tmp_path / "run")
    run_fr_main([
        "--data-dir", root, "--scores-csv", csv,
        "--epochs", "1", "--folds", "1", "--batch-size", "4",
        "--num-workers", "0", "--regression-type", "linear",
        "--dists-variant", "main", "--schedule", "constant",
        "--video-stats-cols", "DISTS_std,DISTS_min,DISTS_max",
        "--scene-type-conditioning",
        "--val-dataset", "test2", "--val-data-dir", root,
        "--val-scores-csv", csv,
        "--output-dir", out,
    ])
    # cross-dataset validation wrote per-video results for the final pass
    val_csvs = [f for f in os.listdir(out) if f.startswith("results_val_")]
    assert val_csvs, os.listdir(out)
    val_df = pd.read_csv(os.path.join(out, val_csvs[0]))
    assert len(val_df) == 4  # 2 scenes x 2 methods
    assert np.isfinite(val_df["pred_score"].values).all()
    with open(os.path.join(out, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["video_stats_cols"] == "DISTS_std,DISTS_min,DISTS_max"
    assert cfg["scene_type_conditioning"] is True


def test_run_fr_head_init_without_dists_column(fr_tree, tmp_path):
    """No DISTS column -> head init scores the training videos with the
    pretrained metric (replaces the constant-0.25 filler landmine)."""
    root, csv = fr_tree
    df = pd.read_csv(csv).drop(
        columns=["DISTS", "DISTS_std", "DISTS_min", "DISTS_max"]
    )
    csv2 = str(tmp_path / "scores_nodists.csv")
    df.to_csv(csv2, index=False)
    out = str(tmp_path / "run2")
    run_fr_main([
        "--data-dir", root, "--scores-csv", csv2,
        "--epochs", "1", "--folds", "1", "--batch-size", "4",
        "--num-workers", "0", "--regression-type", "linear",
        "--dists-variant", "main", "--schedule", "constant",
        "--output-dir", out,
    ])
    assert os.path.exists(os.path.join(out, "config.json"))
