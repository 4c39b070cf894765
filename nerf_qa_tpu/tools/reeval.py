"""Re-evaluate a trained FR model checkpoint on a dataset.

Reference behavior: reeval.py — load a saved model (torch.load
'model_fin.pth', reeval.py:83), score every test video, write
results_reeval.csv. Accepts either this framework's orbax checkpoints
or a reference torch model.pth (via compat converter).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from nerf_qa_tpu.compat.checkpoint import restore_checkpoint
from nerf_qa_tpu.compat.pretrained import add_backbone_args, resolve_vgg_params
from nerf_qa_tpu.config import DISTSConfig, FRModelConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.data.factories import create_test2_dataloader
from nerf_qa_tpu.logging.metrics import MetricCollectionLogger
from nerf_qa_tpu.tools.run_fr import label_scene_types
from nerf_qa_tpu.train.fr_train import FRTrainer


def load_params(path: str, cfg: FRModelConfig):
    """(params, embedded_vgg|None) from a checkpoint dir (orbax) or a
    torch model.pth — the .pth also carries the frozen VGG stages
    (dists_model.stageK.*, DISTS_pt.py:31-49), recovered so the
    re-evaluation runs the exact pyramid the model was trained with."""
    if path.endswith((".pth", ".pt")):
        from nerf_qa_tpu.compat.checkpoint import convert_fr_model_from_torch

        import jax.numpy as jnp

        flat, ab, vgg = convert_fr_model_from_torch(path)
        head = {k.split(".")[1]: jnp.asarray(v) for k, v in flat.items()
                if k.startswith("head.")}
        w = dists.load_pretrained_weights(cfg.dists)
        if ab is not None:
            w = dists.DISTSWeights(jnp.asarray(ab["alpha"]),
                                   jnp.asarray(ab["beta"]))
        return {"head": head, "dists": w}, vgg
    restored = restore_checkpoint(path)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    _, state = restored
    return state["params"], None


def main(argv=None):
    p = argparse.ArgumentParser(description="Re-evaluate an FR checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--scores-csv", required=True)
    p.add_argument("--regression-type", default="logistic")
    p.add_argument("--subjective-score-type", default="MOS")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--output-csv", default="results_reeval.csv")
    p.add_argument("--compute-dtype", default="bfloat16")
    add_backbone_args(p)
    args = p.parse_args(argv)

    cfg = FRModelConfig(
        regression_type=args.regression_type,
        subjective_score_type=args.subjective_score_type,
        dists=DISTSConfig(compute_dtype=args.compute_dtype),
    )
    params, embedded_vgg = load_params(args.checkpoint, cfg)
    scores_df = label_scene_types(pd.read_csv(args.scores_csv))
    # an explicit --vgg-ckpt wins; otherwise prefer the pyramid embedded
    # in the torch model itself
    vgg = (resolve_vgg_params(args.vgg_ckpt, seed=0)
           if args.vgg_ckpt or embedded_vgg is None else embedded_vgg)
    trainer = FRTrainer(vgg, cfg)
    loader = create_test2_dataloader(scores_df, args.data_dir,
                                     batch_size=args.batch_size,
                                     scene_balanced=False)
    result = trainer.score_dataloader(params, iter(loader))
    logger = MetricCollectionLogger("Reeval Metrics Dict")
    for vid, pred in result["pred_score"].items():
        row = scores_df.iloc[int(vid)]
        logger.add_entries(
            {"pred_score": pred, "mos": float(row[args.subjective_score_type]),
             "dists_score": result["dists_score"][vid]},
            video_ids=int(vid), scene_ids=row["scene"],
        )
    df = logger.video_metrics_df()
    df.to_csv(args.output_csv)
    logs = logger.log_summary(0)
    corr = {k.split("/")[-1]: round(v, 4) for k, v in logs.items()
            if "/correlations/mos/" in k}
    print("correlations:", corr)
    print("wrote", args.output_csv)


if __name__ == "__main__":
    main()
