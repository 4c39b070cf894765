"""prep_fr / prep_nr CLIs end-to-end on synthetic fixture trees
(the reference's prep.py / test2_prep.py / nerf_nr_qa_prep*.py flows)."""
import ast
import os

import numpy as np
import pandas as pd
import pytest

from nerf_qa_tpu.tools.make_synthetic_dataset import make_fr_tree, make_nr_tree
from nerf_qa_tpu.tools.prep_fr import main as prep_fr_main
from nerf_qa_tpu.tools.prep_nr import main as prep_nr_main


@pytest.fixture(scope="module")
def fr_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prep_fr"))
    csv = make_fr_tree(root, scenes=("lego", "truck"), methods_per_scene=1,
                       frames=2, hw=(64, 64))
    return root, csv


def test_prep_fr_square_policy(fr_tree, tmp_path):
    root, csv = fr_tree
    out = str(tmp_path / "scores_square.csv")
    prep_fr_main([
        "--data-dir", root, "--scores-csv", csv, "--policy", "square",
        "--no-adists", "--compute-dtype", "float32", "--batch-size", "2",
        "--output-csv", out,
    ])
    df = pd.read_csv(out)
    assert len(df) == 2
    for col in ("DISTS", "DISTS_std", "DISTS_min", "DISTS_max"):
        assert np.isfinite(df[col].values).all(), col
    frames = ast.literal_eval(df["DISTS_frames"].iloc[0])
    assert len(frames) == 2
    # distorted != reference on the fixture -> strictly positive scores
    assert (df["DISTS"].values > 0).all()


def test_prep_nr_tree_walk_and_scene_stats(tmp_path):
    root = str(tmp_path / "nr")
    make_nr_tree(root, scenes=("chair", "drums"), methods=("nerfacto",),
                 frames=2, hw=(64, 64))
    out = str(tmp_path / "output.csv")
    prep_nr_main([
        "--data-dir", root, "--output-csv", out,
        "--compute-dtype", "float32", "--batch-size", "2",
    ])
    df = pd.read_csv(out)
    assert set(df["scene"]) == {"chair", "drums"}
    for col in ("DISTS_frames", "DISTS_std", "DISTS_mean"):
        assert col in df.columns, col
    per_frame = ast.literal_eval(df["DISTS_frames"].iloc[0])
    assert len(per_frame) == 2 and all(np.isfinite(per_frame))
    # scene stats are across-method per-frame lists (_3.py:27-44)
    std = ast.literal_eval(df["DISTS_std"].iloc[0])
    assert len(std) == 2
