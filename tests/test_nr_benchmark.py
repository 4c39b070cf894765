"""NR video-level benchmark loop on a synthetic fixture: syn/tnt/all
subsets vs MOS *and* DMOS (train-nr.py:299-375 semantics)."""
import os

import numpy as np
import pandas as pd
import pytest

from nerf_qa_tpu.eval.nr_benchmark import (
    benchmark_report,
    load_render_frames,
    score_benchmark_videos,
)


@pytest.fixture()
def fixture(tmp_path):
    """8 videos (4 tnt + 4 syn) as tiny frame dirs + a benchmark CSV."""
    from PIL import Image

    rng = np.random.default_rng(0)
    rows = []
    refs = ["truck_reference.mp4", "playground_reference.mp4",
            "train_reference.mp4", "m60_reference.mp4",
            "lego_reference.mp4", "drums_reference.mp4",
            "ficus_reference.mp4", "ship_reference.mp4"]
    for i, ref in enumerate(refs):
        name = f"video{i}.mp4"
        d = tmp_path / "NeRF-QA_videos" / f"video{i}"
        d.mkdir(parents=True)
        for t in range(3):
            img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{t:03d}.png")
        rows.append({
            "reference_filename": ref,
            "distorted_filename": name,
            "MOS": 1.0 + i * 0.5,
            "DMOS": 8.0 - i * 0.5,
            "DISTS": 0.2 + 0.01 * i,
        })
    return str(tmp_path), pd.DataFrame(rows)


def test_load_render_frames_finds_frame_dir(fixture):
    data_dir, df = fixture
    r256, r224 = load_render_frames(data_dir, df.iloc[0],
                                    render_size=64, sem_size=56)
    assert r256.shape == (3, 64, 64, 3)
    assert r224.shape == (3, 56, 56, 3)
    assert r256.dtype == np.float32 and r256.max() <= 1.0


def test_benchmark_subsets_and_targets(fixture):
    data_dir, df = fixture
    # fake scorer: mean frame intensity -> deterministic per-video scores
    scores = score_benchmark_videos(
        lambda a, b: float(a.mean()), df, data_dir,
        render_size=64, sem_size=56,
    )
    assert scores.shape == (8,)
    report = benchmark_report(df, scores)
    # VERDICT 'done when': subsets and BOTH targets in the logged dict
    for subset in ("tnt/", "syn/", ""):
        for target in ("mos", "dmos"):
            for metric in ("plcc", "srcc", "ktcc"):
                assert f"{subset}{target}/{metric}" in report, (
                    subset, target, metric, sorted(report))
        assert f"{subset}mos/l1" in report
    assert all(np.isfinite(v) for v in report.values())


def test_benchmark_perfect_correlation(fixture):
    _, df = fixture
    report = benchmark_report(df, df["MOS"].values.astype(float))
    assert report["mos/plcc"] == pytest.approx(1.0)
    assert report["dmos/srcc"] == pytest.approx(-1.0)
