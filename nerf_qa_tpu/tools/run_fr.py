"""FR trainer CLI — the canonical experiment driver.

Reference behavior: run_final.py — argparse hyperparameters (:54-75),
scene/scene-type labeling (:77-95), 4-fold GroupKFold-by-scene CV then a
final full-data train (:231-239), per-fold train/test loops with the
metric logger, and artifacts results_{fold}.csv / results.csv / model
checkpoints (:275-344). Variants run.py / run_test2*.py / run_nerf_qa.py
are dataset/objective selections exposed here as --dataset/--val-dataset
flags rather than copied scripts.

Usage:
  python -m nerf_qa_tpu.tools.run_fr --data-dir <Test2 root> \
      --scores-csv <csv> --lr 1e-4 --epochs 10 [--folds 4] ...
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd

from nerf_qa_tpu.compat.checkpoint import save_checkpoint
from nerf_qa_tpu.compat.pretrained import (
    add_backbone_args,
    resolve_dists_weights,
    resolve_vgg_params,
)
from nerf_qa_tpu.config import DISTSConfig, FRModelConfig, TrainConfig, from_args
from nerf_qa_tpu.data.factories import (
    create_nerf_qa_resize_dataloader,
    create_test2_dataloader,
)
from nerf_qa_tpu.eval.correlations import REAL_SCENE_IDS, SYNTH_SCENE_IDS
from nerf_qa_tpu.logging.metrics import (
    MetricCollectionLogger,
    jsonl_sink,
    log_artifact,
)
from nerf_qa_tpu.train.fr_train import FRTrainer, group_kfold_splits
from nerf_qa_tpu.utils.profiling import StepTimer, record_function


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FR NeRF-QA trainer")
    # hyperparameters (run_final.py:54-75)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--eps", type=float, default=1e-8)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--schedule", default="exp", choices=["exp", "cosine", "constant"])
    p.add_argument("--gamma", type=float, default=0.95)
    p.add_argument("--folds", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    # model config
    p.add_argument("--regression-type", dest="regression_type",
                   default="logistic", choices=["logistic", "sqrt", "linear"])
    p.add_argument("--subjective-score-type", dest="subjective_score_type",
                   default="MOS", choices=["MOS", "DMOS"])
    p.add_argument("--dists-variant", default="original",
                   choices=["main", "original", "softmax"])
    p.add_argument("--dists-weight-norm", dest="weight_norm", default="")
    p.add_argument("--detach-beta", action="store_true")
    p.add_argument("--weight-lower-bound", type=float, default=0.0)
    p.add_argument("--alpha-beta-ratio", type=float, default=1.0)
    p.add_argument("--entropy-loss-coeff", type=float, default=0.0)
    p.add_argument("--project-weights", action="store_true")
    p.add_argument("--head-lr-scale", type=float, default=1.0)
    p.add_argument("--scene-type-conditioning", action="store_true",
                   help="per-scene-type affine calibration of the head "
                        "output (the scene_type= hook of run_test2.py:218)")
    p.add_argument("--video-stats-cols", default="",
                   help="comma-separated CSV columns of per-video DISTS "
                        "statistics fed to the regression head, e.g. "
                        "'DISTS_std,DISTS_min,DISTS_max' "
                        "(run_test2_stats.py:122-135,195)")
    # data / IO
    p.add_argument("--data-dir", required=True)
    p.add_argument("--scores-csv", required=True)
    p.add_argument("--dataset", default="test2",
                   choices=["test2", "nerf-qa-resized", "large"])
    # cross-dataset validation (run_test2.py:165-167 trains on Test2 and
    # validates on Large)
    p.add_argument("--val-dataset", default=None,
                   choices=["test2", "nerf-qa-resized", "large"])
    p.add_argument("--val-data-dir", default=None)
    p.add_argument("--val-scores-csv", default=None)
    p.add_argument("--in-memory", action="store_true")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--output-dir", default="./fr_runs")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--stats-impl", default="xla", choices=["xla", "pallas"])
    p.add_argument("--wandb", action="store_true",
                   help="log to wandb if installed (JSONL sink otherwise)")
    p.add_argument("--grad-accum-steps", type=int, default=0,
                   help="accumulate N micro-batch gradients per step "
                        "(run.py full-epoch accumulation style)")
    p.add_argument("--cache-stats", action="store_true",
                   help="precompute the frozen-VGG DISTS statistics of "
                        "every training pair once, then train α/β + head "
                        "over the cached (5,1475) moments — exact "
                        "gradients, epochs cost ~nothing. Valid for "
                        "deterministic datasets (test2/large); ignored "
                        "with --dataset nerf-qa-resized (random crops "
                        "change the features every epoch). Cached "
                        "moments are always fp32: with --compute-dtype "
                        "bfloat16 the cached path scores in fp32 from "
                        "bf16 pyramids (slightly more accurate than the "
                        "end-to-end bf16 image path)")
    add_backbone_args(p)
    return p


def label_scene_types(scores_df: pd.DataFrame) -> pd.DataFrame:
    """Scene + scene_type columns (run_final.py:82-95)."""
    df = scores_df.copy()
    if "scene" not in df.columns:
        src = "reference_folder" if "reference_folder" in df else "reference_filename"
        df["scene"] = df[src].apply(
            lambda x: os.path.splitext(str(x))[0].replace("_reference", "")
        )
    df["scene_type"] = df["scene"].apply(
        lambda s: "real" if s in REAL_SCENE_IDS
        else ("synthetic" if s in SYNTH_SCENE_IDS else "unknown")
    )
    return df


def make_sink(args, run_dir: str):
    if args.wandb:
        try:
            from nerf_qa_tpu.logging.metrics import wandb_sink

            return wandb_sink()
        except Exception:
            pass
    return jsonl_sink(os.path.join(run_dir, "metrics.jsonl"))


def make_loader(args, df, seed: int, dataset: str | None = None,
                data_dir: str | None = None):
    dataset = dataset or args.dataset
    data_dir = data_dir or args.data_dir
    if dataset == "nerf-qa-resized":
        return create_nerf_qa_resize_dataloader(
            df, data_dir, batch_size=args.batch_size,
            num_workers=args.num_workers, seed=seed,
        )
    if dataset == "large":
        from nerf_qa_tpu.data.factories import create_large_qa_dataloader

        return create_large_qa_dataloader(
            df, data_dir, batch_size=args.batch_size,
            num_workers=args.num_workers, seed=seed,
        )
    return create_test2_dataloader(
        df, data_dir, batch_size=args.batch_size,
        in_memory=args.in_memory, num_workers=args.num_workers, seed=seed,
    )


SCENE_TYPE_IDS = {"real": 0, "synthetic": 1, "unknown": 2}


def scene_type_lookup(df) -> dict[int, int]:
    """{row index (video id): scene-type id} for the calibration head."""
    return {
        int(i): SCENE_TYPE_IDS.get(str(t), SCENE_TYPE_IDS["unknown"])
        for i, t in enumerate(df.reset_index(drop=True)["scene_type"])
    }


def stats_lookup(df, cols: list[str]):
    """{row index (video id): per-video stats vector} from CSV columns."""
    return {
        int(i): np.asarray([row[c] for c in cols], np.float32)
        for i, row in df.reset_index(drop=True).iterrows()
    }


def run_fold(args, fold: int, train_df, test_df, run_dir: str):
    model_cfg = FRModelConfig(
        regression_type=args.regression_type,
        subjective_score_type=args.subjective_score_type,
        dists=DISTSConfig(
            variant=args.dists_variant,
            weight_norm=args.weight_norm,
            detach_beta=args.detach_beta,
            weight_lower_bound=args.weight_lower_bound,
            alpha_beta_ratio=args.alpha_beta_ratio,
            compute_dtype=args.compute_dtype,
            stats_impl=args.stats_impl,
        ),
    )
    train_cfg = from_args(TrainConfig(), vars(args)).replace(
        batch_size=args.batch_size,
        entropy_loss_coeff=args.entropy_loss_coeff,
        project_weights=args.project_weights,
        grad_accum_steps=args.grad_accum_steps,
    )
    train_df = train_df.reset_index(drop=True)
    stats_cols = [c for c in args.video_stats_cols.split(",") if c]
    train_loader = make_loader(args, train_df, args.seed)
    steps_per_epoch = max(1, len(train_loader))
    vgg_params = resolve_vgg_params(args.vgg_ckpt, seed=args.seed)
    dists_weights = resolve_dists_weights(model_cfg.dists, args.dists_weights)
    n_scene_types = len(SCENE_TYPE_IDS) if args.scene_type_conditioning else 0
    trainer = FRTrainer(vgg_params, model_cfg, train_cfg,
                        steps_per_epoch=steps_per_epoch,
                        head_lr_scale=args.head_lr_scale,
                        dists_weights=dists_weights,
                        n_stats=len(stats_cols),
                        n_scene_types=n_scene_types)
    use_cache = args.cache_stats and args.dataset != "nerf-qa-resized"
    if args.cache_stats and not use_cache:
        print("--cache-stats ignored: nerf-qa-resized re-crops every epoch")
    cache = None
    if use_cache:
        from nerf_qa_tpu.data.pipeline import DataLoader

        # one sequential frozen-VGG pass over the whole train split;
        # epochs then run on the cached (5,1475) moments
        seq_loader = DataLoader(train_loader.dataset,
                                batch_size=args.batch_size, sampler=None,
                                num_workers=args.num_workers)
        cache = trainer.build_stats_cache(iter(seq_loader))

    # data-driven head init needs per-video DISTS values; compute them
    # with the pretrained metric when the CSV doesn't carry a DISTS
    # column (prep.py normally writes it)
    if "DISTS" in train_df.columns:
        x = train_df["DISTS"].values
    else:
        print("no DISTS column — scoring training videos for head init")
        if cache is not None:
            from nerf_qa_tpu.core import dists as dists_core

            # chunk over frames: the full (5, N, 1475) fp32 cache plus
            # its elementwise intermediates would OOM HBM at large N
            chunk = max(1, args.batch_size)
            frame_scores = np.concatenate([
                np.asarray(dists_core.score_from_stats(
                    cache["stats"][i:i + chunk].transpose(1, 0, 2),
                    trainer.original_weights, model_cfg.dists,
                ))
                for i in range(0, len(cache["stats"]), chunk)
            ])
            per_video = {
                int(v): float(np.mean(frame_scores[cache["video_ids"] == v]))
                for v in np.unique(cache["video_ids"])
            }
        else:
            per_video = trainer.compute_dists_scores(iter(train_loader))
        x = np.asarray([per_video.get(i, np.nan) for i in range(len(train_df))])
        x = np.where(np.isnan(x), np.nanmean(x), x)
    y = train_df[args.subjective_score_type].values
    params, opt_state = trainer.init(x, y)
    train_stats = stats_lookup(train_df, stats_cols) if stats_cols else None
    train_types = (scene_type_lookup(train_df)
                   if args.scene_type_conditioning else None)

    sink = make_sink(args, run_dir)
    train_logger = MetricCollectionLogger(f"Train Metrics Dict", log_fn=sink)
    test_logger = MetricCollectionLogger(f"Test Metrics Dict", log_fn=sink)
    timer = StepTimer()

    scene_of_video = dict(enumerate(train_df["scene"].tolist()))
    step = 0
    if use_cache:
        rng = np.random.default_rng(args.seed)
        for epoch in range(args.epochs):
            sampler = train_loader.sampler
            if hasattr(sampler, "set_epoch"):
                sampler.set_epoch(epoch)
            # flatten defensively: batch samplers (e.g.
            # ComputeBatchSampler) yield index LISTS, not scalars
            order = (np.concatenate(
                        [np.atleast_1d(b) for b in sampler]
                     ).astype(np.int64)
                     if sampler is not None
                     else rng.permutation(len(cache["targets"])))
            with record_function("train_epoch"):
                params, opt_state, _ = trainer.train_epoch_cached(
                    params, opt_state, cache, order, args.batch_size,
                    logger=train_logger, scene_of_video=scene_of_video,
                    stats_of_video=train_stats,
                    scene_type_of_video=train_types,
                )
            step += max(1, len(order) // max(1, args.batch_size))
            timer.tick()
            train_logger.log_summary(step)
    for epoch in ([] if use_cache else range(args.epochs)):
        if hasattr(train_loader.sampler, "set_epoch"):
            train_loader.sampler.set_epoch(epoch)
        with record_function("train_epoch"):
            for batch in train_loader:
                dist, ref, score, vid = batch[:4]
                stats = None
                if train_stats is not None:
                    stats = np.stack([
                        train_stats[int(v)] for v in np.asarray(vid)
                    ])
                scene_types = None
                if train_types is not None:
                    scene_types = np.asarray(
                        [train_types[int(v)] for v in np.asarray(vid)],
                        np.int32,
                    )
                params, opt_state, loss, aux = trainer.train_step(
                    params, opt_state, dist, ref, score, stats=stats,
                    scene_types=scene_types,
                )
                pred, dscore, _ = aux
                train_logger.add_entries(
                    {
                        "loss": np.full(len(vid), float(loss)),
                        "mse": np.square(np.asarray(pred) - np.asarray(score)),
                        "pred_score": np.asarray(pred),
                        "mos": np.asarray(score),
                    },
                    video_ids=np.asarray(vid),
                    scene_ids=np.asarray(
                        [scene_of_video.get(int(v), "?") for v in np.asarray(vid)]
                    ),
                )
                timer.tick()
                step += 1
        train_logger.log_summary(step)

    # test: per-video scoring over the held-out fold (run_final.py:132-166)
    if len(test_df):
        test_df = test_df.reset_index(drop=True)
        test_loader = make_loader(args, test_df, args.seed)
        test_stats = stats_lookup(test_df, stats_cols) if stats_cols else None
        test_types = (scene_type_lookup(test_df)
                      if args.scene_type_conditioning else None)
        result = trainer.score_dataloader(params, iter(test_loader),
                                          stats_of_video=test_stats,
                                          scene_type_of_video=test_types)
        scene_of_test = dict(enumerate(test_df["scene"].tolist()))
        for vid, pred in result["pred_score"].items():
            test_logger.add_entries(
                {
                    "pred_score": pred,
                    "mos": float(test_df.iloc[int(vid)][args.subjective_score_type]),
                    "dists_score": result["dists_score"][vid],
                },
                video_ids=int(vid),
                scene_ids=scene_of_test.get(int(vid), "?"),
            )
        results_df = test_logger.video_metrics_df()
        results_path = os.path.join(run_dir, f"results_{fold}.csv")
        results_df.to_csv(results_path)
        log_artifact(results_path, type="results")
        # per-scene regression figure (logger.py:207): plotly-schema
        # JSON artifact; rendered live only when wandb+plotly exist
        from nerf_qa_tpu.logging.figures import to_wandb, write_figure_json

        fig = test_logger.per_scene_figure()
        fig_path = write_figure_json(
            fig, os.path.join(run_dir, f"regression_{fold}.plotly.json"))
        log_artifact(fig_path, type="figure")
        wfig = to_wandb(fig)
        if wfig is not None and args.wandb:
            try:
                sink({"Test Metrics Dict/scene_regression": wfig}, step)
            except TypeError:
                pass  # non-wandb sink can't serialize a Plotly object
        test_logger.log_summary(step)

    # cross-dataset validation (run_test2.py:165-167: train Test2,
    # validate Large)
    if args.val_scores_csv and args.val_data_dir:
        val_df = label_scene_types(pd.read_csv(args.val_scores_csv))
        val_loader = make_loader(args, val_df, args.seed,
                                 dataset=args.val_dataset or args.dataset,
                                 data_dir=args.val_data_dir)
        val_stats = stats_lookup(val_df, stats_cols) if stats_cols else None
        val_types = (scene_type_lookup(val_df)
                     if args.scene_type_conditioning else None)
        result = trainer.score_dataloader(params, iter(val_loader),
                                          stats_of_video=val_stats,
                                          scene_type_of_video=val_types)
        val_logger = MetricCollectionLogger("Validation Metrics Dict",
                                            log_fn=sink)
        scene_of_val = dict(enumerate(val_df["scene"].tolist()))
        for vid, pred in result["pred_score"].items():
            val_logger.add_entries(
                {
                    "pred_score": pred,
                    "mos": float(val_df.iloc[int(vid)][args.subjective_score_type]),
                    "dists_score": result["dists_score"][vid],
                },
                video_ids=int(vid),
                scene_ids=scene_of_val.get(int(vid), "?"),
            )
        val_logger.video_metrics_df().to_csv(
            os.path.join(run_dir, f"results_val_{fold}.csv")
        )
        val_logger.log_summary(step)
    ckpt_path = save_checkpoint(os.path.join(run_dir, "ckpt"), fold,
                                {"params": params})
    # run_final.py:328-336 uploads the saved model as a wandb Artifact
    log_artifact(ckpt_path, name=f"model_{fold}", type="model")
    return params


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    run_dir = args.output_dir
    scores_df = label_scene_types(pd.read_csv(args.scores_csv))

    cv_rows = []
    if args.folds > 1:
        for fold, (tr, te) in enumerate(
            group_kfold_splits(scores_df["scene"].values, args.folds, args.seed)
        ):
            print(f"=== fold {fold}: {len(tr)} train / {len(te)} test videos")
            run_fold(args, fold, scores_df.iloc[tr], scores_df.iloc[te], run_dir)
            cv_rows.append({"fold": fold, "train": len(tr), "test": len(te)})
        pd.DataFrame(cv_rows).to_csv(
            os.path.join(run_dir, "results_cv.csv"), index=False
        )
    # final full-data train (run_final.py's last pass)
    print("=== final full-data train")
    run_fold(args, args.folds, scores_df, scores_df.iloc[:0], run_dir)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    print(f"artifacts in {run_dir}")


if __name__ == "__main__":
    main()
