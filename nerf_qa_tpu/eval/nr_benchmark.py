"""NR video-level benchmark loop: PLCC/SRCC/KTCC vs MOS and DMOS for
syn/tnt/all subsets.

Reference behavior: train-nr.py:299-375 — every 5 epochs, score each
NeRF-QA benchmark video (per-frame NR forward, mean over frames), split
by reference_filename into tnt (truck/playground/train/m60) and syn
(lego/drums/ficus/ship) subsets, and log correlations against MOS and
DMOS plus L1 vs the precomputed DISTS column, under
``Test Metrics Dict/{subset}/{target}/{metric}`` keys.
"""
from __future__ import annotations

import os

import numpy as np

from nerf_qa_tpu.data.imaging import resize_image
from nerf_qa_tpu.data.video import load_video_frames
from nerf_qa_tpu.eval.correlations import compute_correlations

# subset membership by reference file (train-nr.py:320-324)
TNT_FILES = (
    "truck_reference.mp4", "playground_reference.mp4",
    "train_reference.mp4", "m60_reference.mp4",
)
SYN_FILES = (
    "lego_reference.mp4", "drums_reference.mp4",
    "ficus_reference.mp4", "ship_reference.mp4",
)


def _strip(name: str) -> str:
    return os.path.splitext(str(name))[0]


TNT_NAMES = tuple(_strip(f) for f in TNT_FILES)
SYN_NAMES = tuple(_strip(f) for f in SYN_FILES)


def load_render_frames(data_dir: str, row, max_frames: int | None = None,
                       render_size: int = 256,
                       sem_size: int = 224) -> tuple[np.ndarray, np.ndarray]:
    """Render frames of one benchmark row as ({render_size}², {sem_size}²)
    stacks. Accepts the reference layout (NeRF-QA_videos/<mp4>) or a
    frame directory named after the video (mp4-free environments)."""
    name = str(row["distorted_filename"])
    candidates = [
        os.path.join(data_dir, "NeRF-QA_videos", name),
        os.path.join(data_dir, name),
        os.path.join(data_dir, "NeRF-QA_videos", _strip(name)),
        os.path.join(data_dir, _strip(name)),
    ]
    path = next((c for c in candidates if os.path.exists(c)), None)
    if path is None:
        raise FileNotFoundError(f"no video/frames for {name} in {data_dir}")
    frames = load_video_frames(path, resize=False, max_frames=max_frames)
    r256 = np.stack([resize_image(f, render_size, render_size)
                     for f in frames])
    r224 = np.stack([resize_image(f, sem_size, sem_size) for f in frames])
    return r256.astype(np.float32), r224.astype(np.float32)


def score_benchmark_videos(score_video_fn, test_df, data_dir: str,
                           max_frames: int | None = None,
                           render_size: int = 256,
                           sem_size: int = 224) -> np.ndarray:
    """Per-video mean NR scores (train-nr.py:305-315).

    score_video_fn(r256, r224) -> float — e.g.
    ``lambda a, b: trainer.score_video(params, state, a, b)``."""
    scores = []
    for _, row in test_df.iterrows():
        r256, r224 = load_render_frames(data_dir, row, max_frames,
                                        render_size, sem_size)
        scores.append(float(score_video_fn(r256, r224)))
    return np.asarray(scores)


def benchmark_report(test_df, video_scores: np.ndarray) -> dict[str, float]:
    """Correlations vs MOS and DMOS for syn/tnt/all, flat-keyed exactly
    like the reference's wandb logs (train-nr.py:326-375):
    ``{subset/}{mos|dmos}/{plcc|srcc|ktcc}`` (+ ``{subset/}mos/l1`` vs the
    DISTS column when present)."""
    df = test_df.reset_index(drop=True).copy()
    df["TEST_SCORE"] = np.asarray(video_scores, np.float64)
    ref_names = df["reference_filename"].astype(str).map(_strip)
    subsets = {
        "tnt": df[ref_names.isin(TNT_NAMES).values],
        "syn": df[ref_names.isin(SYN_NAMES).values],
        "": df,
    }
    out: dict[str, float] = {}
    for prefix, sub in subsets.items():
        if len(sub) < 2:
            continue
        key = f"{prefix}/" if prefix else ""
        scores = sub["TEST_SCORE"].values
        for target, tkey in (("MOS", "mos"), ("DMOS", "dmos")):
            if target not in sub.columns:
                continue
            corr = compute_correlations(scores, sub[target].values)
            for m, v in corr.items():
                out[f"{key}{tkey}/{m}"] = v
        if "DISTS" in sub.columns:
            out[f"{key}mos/l1"] = float(
                np.mean(np.abs(scores - sub["DISTS"].values))
            )
    return out
