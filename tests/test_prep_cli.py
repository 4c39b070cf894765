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


def test_prep_fr_iqa_wiring_argument_order():
    """The PairScorer calls every metric as fn(distorted, reference);
    metrics whose math is reference-first (VIF's information model,
    MAD's contrast masking) must be swap-wired. ADVICE r4 (high): MAD
    was registered unswapped, silently computing masking from the
    render. Pin the wiring against direct reference-first calls on an
    asymmetric (blurred) pair, where the wrong order visibly differs."""
    import jax.numpy as jnp

    from nerf_qa_tpu.eval import iqa
    from nerf_qa_tpu.tools.prep_fr import PairScorer

    rng = np.random.default_rng(0)
    ref = rng.random((1, 48, 64, 3), dtype=np.float32)
    # blur = asymmetric distortion (ref has texture the render lost)
    k = np.ones((5, 5, 1)) / 25.0
    from scipy.ndimage import convolve

    render = np.clip(convolve(ref[0], k, mode="nearest"), 0, 1)[None]
    render = render.astype(np.float32)

    scorer = PairScorer(compute_dtype="float32", with_adists=False,
                        iqa_metrics=("mad", "vif", "nlpd"))
    out = scorer.score_pairs(ref, render)

    mad_correct = float(iqa.mad(jnp.asarray(ref), jnp.asarray(render))[0])
    mad_swapped = float(iqa.mad(jnp.asarray(render), jnp.asarray(ref))[0])
    assert abs(mad_correct - mad_swapped) > 1e-3, (
        "fixture not asymmetric enough to detect a swap")
    assert out["MAD"][0] == pytest.approx(mad_correct, rel=1e-4)

    vif_correct = float(iqa.vif(jnp.asarray(ref), jnp.asarray(render))[0])
    assert out["VIF"][0] == pytest.approx(vif_correct, rel=1e-4)

    # 48-px min side supports only 4 NLPD levels; the wiring clamps
    # instead of raising inside jit (ADVICE r4 low)
    levels = iqa.nlpd_max_levels(48, 64)
    assert levels == 5  # 3 * 2^(5-1) = 48 == min side, 6 would pad-fail
    nlpd_direct = float(
        iqa.nlpd(jnp.asarray(render), jnp.asarray(ref), levels=levels)[0])
    assert out["NLPD"][0] == pytest.approx(nlpd_direct, rel=1e-4)


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
