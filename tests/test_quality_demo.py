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
def test_fr_quality_certificate(tmp_path, capsys):
    """Seeded strong-recovery regime (VERDICT r2 #1): 40 videos, 4-fold
    scene-grouped CV through the full run_fr driver (stats-cache path).
    Reference semantics: run_final.py:132-166. Measured on this fixture:
    cv_plcc 0.99, cv_srcc 0.94 (TPU) — thresholds leave generous margin
    while still failing any learning-destroying regression (the
    pre-head-init-fix build scored cv_plcc 0.49 / cv_srcc 0.07)."""
    qdemo_main([
        "--kind", "fr", "--out", str(tmp_path / "q"),
        "--epochs", "5", "--folds", "4", "--scenes", "8", "--methods", "5",
        "--frames", "2", "--batch-size", "16",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["n_videos"] == 40
    assert res["cv_plcc"] >= 0.90, res
    assert res["cv_srcc"] >= 0.80, res
    assert res["cv_ktcc"] >= 0.60, res


@pytest.mark.slow
def test_nr_quality_certificate(tmp_path, capsys):
    """NR counterpart (VERDICT r2 #1): scene-holdout validation through
    the full train_nr driver (self-supervised DISTS objective + the
    video-level correlation loop, train-nr.py:270-377). 10 held-out
    videos (2 scenes x 5 methods). Measured on this fixture after 6
    epochs: val_plcc 0.918 / val_srcc 0.935 / val_l1 0.134 — thresholds
    below fail any learning-destroying regression while leaving seed
    margin. The untrained floor on the same fixture is val_l1 ~0.5+
    (random decoder output) with near-zero correlations."""
    res = qdemo_main([
        "--kind", "nr", "--out", str(tmp_path / "q"),
        "--epochs", "6",
    ])
    assert res["n_videos"] == 10
    assert res["val_plcc"] >= 0.80, res
    assert res["val_srcc"] >= 0.80, res
    assert res["val_l1"] <= 0.30, res
