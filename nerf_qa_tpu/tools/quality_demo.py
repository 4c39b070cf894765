"""End-to-end quality-recovery demonstration on synthetic data.

The reference's headline numbers are MOS correlations obtained with
pretrained backbones (BASELINE.md §6.1-6.2); this environment ships no
torchvision/DINOv2 checkpoints (zero egress), so absolute parity with
those tables cannot be reproduced here. This tool provides the honest
substitute: it builds a synthetic Test2-layout dataset whose MOS is a
noisy monotone function of the injected distortion strength
(tools/make_synthetic_dataset.py), trains the FR model through the REAL
driver path (tools/run_fr.py — GroupKFold CV, logistic head, metric
logger), and reports held-out cross-validated PLCC/SRCC/KTCC. High
recovered correlations certify the full train->score->aggregate->
correlate stack end-to-end; with real checkpoints the same command on
real datasets reproduces the reference recipe (run_final.py:231-344).

The NR mode (--kind nr) is the analogous certificate for the
no-reference stack: a synthetic NeRF-NR-QA tree whose per-method
distortion strength rises monotonically (and whose DISTS_mean target
column rises with it), trained through tools/train_nr.py (scene-holdout
split, self-supervised DISTS objective, val correlation loop,
train-nr.py:270-377), reporting the held-out-scene video-level
PLCC/SRCC vs the quality targets.

Usage:
  python -m nerf_qa_tpu.tools.quality_demo --out /tmp/qdemo [--epochs 8]
  python -m nerf_qa_tpu.tools.quality_demo --kind nr --out /tmp/qdemo_nr

Prints ONE JSON line:
  fr: {"cv_plcc": ..., "cv_srcc": ..., "cv_ktcc": ..., "n_videos": ...}
  nr: {"val_plcc": ..., "val_srcc": ..., "val_l1": ..., "n_videos": ...}
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np
import pandas as pd


def _nr_demo(args) -> dict:
    from nerf_qa_tpu.tools.make_synthetic_dataset import make_nr_tree
    from nerf_qa_tpu.tools.train_nr import main as train_nr_main

    data_dir = os.path.join(args.out, "data")
    run_dir = os.path.join(args.out, "run")
    os.makedirs(data_dir, exist_ok=True)
    scenes = tuple(f"scene{i:02d}" for i in range(args.scenes))
    methods = tuple(f"m{i}" for i in range(args.methods))
    csv = make_nr_tree(data_dir, scenes=scenes, methods=methods,
                       frames=args.frames, seed=0)
    holdout = list(scenes[: max(1, args.scenes // 4)])
    train_nr_main([
        "--data-dir", data_dir, "--scores-csv", csv,
        "--output-dir", run_dir,
        "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
        "--lr", str(args.lr),
        "--holdout-scenes", *holdout,
        "--test-every", str(args.epochs),  # val pass on the last epoch
        # small-but-valid geometry (64/16 == 56/14) + shallow ViT so the
        # demo compiles in minutes; the driver path is the real one
        "--render-size", "64", "--sem-size", "56", "--vit-depth", "2",
        "--compute-dtype", args.compute_dtype,
        "--decoder-dtype", args.compute_dtype,
        "--num-workers", "2",
    ])
    val = {}
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if any(k.startswith("Validation") for k in rec):
                val = rec
    out = {
        "val_plcc": abs(round(val.get("Validation Metrics Dict/plcc", 0.0), 4)),
        "val_srcc": abs(round(val.get("Validation Metrics Dict/srcc", 0.0), 4)),
        "val_l1": round(val.get("Validation Metrics Dict/l1", -1.0), 4),
        "n_videos": len(holdout) * args.methods,
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="synthetic quality recovery demo")
    p.add_argument("--kind", choices=["fr", "nr"], default="fr")
    p.add_argument("--out", required=True, help="work dir (dataset + run)")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--folds", type=int, default=4)
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--methods", type=int, default=5)
    p.add_argument("--frames", type=int, default=6)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--compute-dtype", default="float32")
    args = p.parse_args(argv)

    if args.kind == "nr":
        if args.batch_size == 16:  # NR device batch default (settings.py)
            args.batch_size = 4
        return _nr_demo(args)

    from nerf_qa_tpu.eval.correlations import compute_correlations
    from nerf_qa_tpu.tools.make_synthetic_dataset import make_fr_tree
    from nerf_qa_tpu.tools.run_fr import main as run_fr_main

    data_dir = os.path.join(args.out, "data")
    run_dir = os.path.join(args.out, "run")
    os.makedirs(data_dir, exist_ok=True)
    scenes = tuple(f"scene{i:02d}" for i in range(args.scenes))
    # dists_col=False: head init must come from REAL metric scores — a
    # logistic head fit to a fabricated DISTS scale saturates on the
    # actual score range and stalls training (see make_fr_tree)
    csv = make_fr_tree(data_dir, scenes=scenes,
                       methods_per_scene=args.methods, frames=args.frames,
                       seed=0, dists_col=False)

    run_fr_main([
        "--data-dir", data_dir, "--scores-csv", csv,
        "--output-dir", run_dir,
        "--epochs", str(args.epochs), "--folds", str(args.folds),
        "--lr", str(args.lr), "--batch-size", str(args.batch_size),
        "--regression-type", "logistic",
        "--compute-dtype", args.compute_dtype,
        "--cache-stats",  # frozen-VGG stats cached once per fold
        "--num-workers", "2",
    ])

    # held-out predictions: fold files only (results_{folds}.csv is the
    # final full-data train with an empty test split, so it never exists)
    frames_dfs = []
    for f in sorted(glob.glob(os.path.join(run_dir, "results_[0-9]*.csv"))):
        fold = int(os.path.splitext(f)[0].rsplit("_", 1)[1])
        if fold < args.folds:
            frames_dfs.append(pd.read_csv(f))
    cv = pd.concat(frames_dfs, ignore_index=True)
    corr = compute_correlations(np.asarray(cv["pred_score"], np.float64),
                                np.asarray(cv["mos"], np.float64))
    out = {
        "cv_plcc": abs(round(corr["plcc"], 4)),
        "cv_srcc": abs(round(corr["srcc"], 4)),
        "cv_ktcc": abs(round(corr["ktcc"], 4)),
        "n_videos": int(len(cv)),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
