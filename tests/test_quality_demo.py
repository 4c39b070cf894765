"""tools/quality_demo: the FR/NR quality-recovery certificates run the
real driver stacks on a synthetic dataset and report held-out
correlations. The slow-marked tests assert RECOVERY THRESHOLDS — a
regression that destroys learning (head saturation, broken gradients,
mis-ordered cache batches) fails them, not just NaN checks. Achieved
values are recorded in PARITY.md §quality."""
import json

import numpy as np
import pytest

from nerf_qa_tpu.tools.quality_demo import main as qdemo_main


def test_fr_quality_demo_smoke(tmp_path, capsys):
    qdemo_main([
        "--kind", "fr", "--out", str(tmp_path / "q"),
        "--epochs", "1", "--folds", "2", "--scenes", "4", "--methods", "2",
        "--frames", "2", "--batch-size", "4",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["n_videos"] == 8
    for k in ("cv_plcc", "cv_srcc", "cv_ktcc"):
        assert np.isfinite(res[k]), res


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fr_quality_certificate(tmp_path, capsys, seed):
    """Seeded strong-recovery regime (VERDICT r2 #1, r3 item 2:
    MULTI-SEED): 40 videos, 4-fold scene-grouped CV through the full
    run_fr driver (stats-cache path). Reference semantics:
    run_final.py:132-166. Measured on this fixture: cv_plcc 0.99,
    cv_srcc 0.94 (TPU, seed 0) — thresholds leave generous margin while
    still failing any learning-destroying regression (the
    pre-head-init-fix build scored cv_plcc 0.49 / cv_srcc 0.07; its own
    history is why single-seed certificates are not trusted)."""
    qdemo_main([
        "--kind", "fr", "--out", str(tmp_path / "q"),
        "--epochs", "5", "--folds", "4", "--scenes", "8", "--methods", "5",
        "--frames", "2", "--batch-size", "16", "--seed", str(seed),
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["n_videos"] == 40
    assert res["cv_plcc"] >= 0.90, (seed, res)
    assert res["cv_srcc"] >= 0.80, (seed, res)
    assert res["cv_ktcc"] >= 0.60, (seed, res)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nr_quality_certificate(tmp_path, capsys, seed):
    """NR counterpart (VERDICT r2 #1, r3 item 2: MULTI-SEED):
    scene-holdout validation through the full train_nr driver
    (self-supervised DISTS objective + the video-level correlation loop,
    train-nr.py:270-377). 10 held-out videos (2 scenes x 5 methods).
    Measured on this fixture after 6 epochs: val_plcc 0.918 /
    val_srcc 0.935 / val_l1 0.134 (seed 0) — thresholds below fail any
    learning-destroying regression while leaving seed margin. The
    untrained floor on the same fixture is val_l1 ~0.5+ (random decoder
    output) with near-zero correlations."""
    res = qdemo_main([
        "--kind", "nr", "--out", str(tmp_path / "q"),
        "--epochs", "6", "--seed", str(seed),
    ])
    assert res["n_videos"] == 10
    assert res["val_plcc"] >= 0.80, (seed, res)
    assert res["val_srcc"] >= 0.80, (seed, res)
    assert res["val_l1"] <= 0.30, (seed, res)


@pytest.mark.tpu
@pytest.mark.slow
def test_nr_production_scale_certificate(tmp_path):
    """VERDICT r3 item 2: certify the PRODUCTION config's LEARNING
    behavior on the real chip — 256²/ViT-12/bf16-decoder/B=8 (the
    recommended train config, PARITY.md), not just its speed
    (bench_nr_step). Asserts the combined loss DECREASES over the run
    and the held-out-scene correlation points the right way. Runs only
    on the hardware tier (NERF_QA_TPU_TESTS=1): the full-size train step
    compiles >10 min cold on the tunnel-attached chip, so this is a
    certificate, not a unit test."""
    import os

    if not os.environ.get("NERF_QA_TPU_TESTS"):
        pytest.skip("production-scale certificate needs the real chip "
                    "(NERF_QA_TPU_TESTS=1)")
    from nerf_qa_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()  # repeat certificates deserialize
    res = qdemo_main([
        "--kind", "nr", "--out", str(tmp_path / "q"),
        "--epochs", "6", "--batch-size", "8",
        "--render-size", "256", "--sem-size", "224", "--vit-depth", "12",
        "--compute-dtype", "bfloat16", "--decoder-dtype", "bfloat16",
        "--scenes", "4", "--methods", "3", "--frames", "8",
    ])
    traj = res["train_combined"]
    assert len(traj) >= 4, res
    # monotone-trend decrease: strictly below the start, and the last
    # epoch is the (joint-)minimum of the trajectory
    assert traj[-1] < traj[0], res
    assert traj[-1] <= min(traj) + 1e-6, res
    # held-out correlation direction: predicted scores must move WITH
    # the quality targets (positive PLCC), not just be non-degenerate
    assert res["val_plcc_signed"] > 0.3, res
    assert np.isfinite(res["val_l1"]) and res["val_l1"] < 0.5, res
