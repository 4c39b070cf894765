"""NR trainer CLI.

Reference behavior: train-nr.py — argparse (:180-203: vit_model,
refine scales, dropout, aug params, dists_pref2ref_coeff, ...),
scene-holdout val split + low-step-count method blacklist (:231-244),
per-epoch training with loss aggregation, every-5-epoch video-level test
with PLCC/SRCC/KTCC vs MOS/DMOS over syn/tnt/all subsets (:299-375),
profiler scopes around data/inference (:273,280).

Usage:
  python -m nerf_qa_tpu.tools.train_nr --data-dir <NeRF-NR-QA root> \
      --scores-csv output.csv --epochs 50 ...
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd

from nerf_qa_tpu.compat.checkpoint import (
    PreemptionSaver,
    restore_checkpoint,
    save_checkpoint,
)
from nerf_qa_tpu.compat.pretrained import (
    add_backbone_args,
    resolve_dists_weights,
    resolve_jbu_params,
    resolve_vgg_params,
    resolve_vit_params,
)
from nerf_qa_tpu.config import DISTSConfig, NRModelConfig, TrainConfig
from nerf_qa_tpu.data.factories import create_nr_dataloader
from nerf_qa_tpu.data.pipeline import device_prefetch
from nerf_qa_tpu.eval.correlations import compute_correlations
from nerf_qa_tpu.logging.metrics import (
    MetricAggregator,
    jsonl_sink,
    log_artifact,
)
from nerf_qa_tpu.models.nr.model import NRModel
from nerf_qa_tpu.train.nr_train import NRTrainer, scene_holdout_split
from nerf_qa_tpu.utils.profiling import StepTimer, record_function


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="NR NeRF-QA trainer")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--eps", type=float, default=1e-8)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    # model (train-nr.py:180-203)
    p.add_argument("--vit-model", default="dinov2",
                   choices=["dinov2", "dino16", "clip", "vit"])
    p.add_argument("--vit-depth", type=int, default=12,
                   help="semantic backbone depth (12 = ViT-S; lower for "
                        "ablations/smoke runs)")
    p.add_argument("--version", type=int, default=8, choices=range(1, 9))
    p.add_argument("--refine-up-depth", type=int, default=2)
    p.add_argument("--transformer-decoder-depth", type=int, default=2)
    p.add_argument("--dropout-rate", type=float, default=0.2)
    p.add_argument("--refine-scale1", type=float, default=1.0)
    p.add_argument("--refine-scale2", type=float, default=0.1)
    p.add_argument("--refine-scale3", type=float, default=0.1)
    p.add_argument("--refine-scale4", type=float, default=0.1)
    p.add_argument("--dists-pref2ref-coeff", type=float, default=0.5)
    # augmentation
    p.add_argument("--aug-crop-scale", type=float, default=0.8)
    p.add_argument("--aug-rot-deg", type=float, default=30.0)
    # data / IO
    p.add_argument("--data-dir", required=True)
    p.add_argument("--scores-csv", required=True)
    p.add_argument("--mode", default="gt", choices=["gt", "score-map"],
                   help="gt: self-supervised DISTS objective "
                        "(train-nr.py); score-map: additionally supervise "
                        "the predicted ADISTS map against prep_nr's "
                        "-log10 score maps (nerf_nr_qa_prep_4.py:101-135)")
    p.add_argument("--score-map-coeff", type=float, default=1.0)
    p.add_argument("--feature-cache", default=None,
                   help="ViT-token cache root from tools/cache_nr_features "
                        "(reference model.py:165-196's offline feature "
                        "dump): train/val steps skip the frozen ViT "
                        "forward. Forces augs off (tokens are cached for "
                        "the canonical frames); mode 'gt' only.")
    p.add_argument("--holdout-scenes", nargs="*", default=[])
    p.add_argument("--blacklist-methods", nargs="*", default=[])
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--output-dir", default="./nr_runs")
    p.add_argument("--test-every", type=int, default=5)
    # NeRF-QA video-level benchmark (train-nr.py:299-375): every
    # --test-every epochs score whole benchmark videos and report
    # PLCC/SRCC/KTCC vs MOS and DMOS for syn/tnt/all subsets
    p.add_argument("--test-scores-csv", default=None,
                   help="NeRF-QA benchmark CSV (reference_filename, "
                        "distorted_filename, MOS, DMOS[, DISTS])")
    p.add_argument("--test-data-dir", default=None,
                   help="benchmark video root (mp4s or frame dirs)")
    p.add_argument("--test-max-frames", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-from", default=None,
                   help="orbax checkpoint dir to initialize the decoder "
                        "params from (fresh optimizer state) — e.g. a "
                        "reference torch NR model converted with "
                        "python -m nerf_qa_tpu.compat.torch_nr")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--decoder-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="decoder conv/attention compute dtype (params and "
                        "optimizer state stay fp32)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each RefineUp stage (activation "
                        "memory -> larger batches)")
    p.add_argument("--render-size", type=int, default=256,
                   help="DISTS input side; must satisfy "
                        "render_size/16 == sem_size/14")
    p.add_argument("--sem-size", type=int, default=224)
    add_backbone_args(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # preemption-resume restarts skip the >10-min full-size recompiles
    from nerf_qa_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    # multi-host (pod): no-op on a single host; when a coordinator is
    # configured, each host decodes only its slice of the frame stream
    from nerf_qa_tpu.parallel.distributed import (
        HostShardedSampler,
        host_info,
        maybe_initialize,
    )

    distributed = maybe_initialize()
    os.makedirs(args.output_dir, exist_ok=True)
    sink = jsonl_sink(os.path.join(args.output_dir, "metrics.jsonl"))

    df = pd.read_csv(args.scores_csv)
    train_mask, val_mask = scene_holdout_split(
        df["scene"].values, args.holdout_scenes,
        df["method"].values if "method" in df else None,
        args.blacklist_methods,
    )
    train_df = df[train_mask].reset_index(drop=True)
    val_df = df[val_mask].reset_index(drop=True)
    print(f"train videos: {len(train_df)}  val videos: {len(val_df)}")

    train_tokens = val_tokens = None
    if args.feature_cache:
        if args.mode != "gt":
            raise SystemExit("--feature-cache requires --mode gt")
        from nerf_qa_tpu.data.feature_cache import TokenCacheReader

        if args.aug_rot_deg or args.aug_crop_scale != 1.0:
            print("feature cache: disabling random augs (tokens are "
                  "cached for the canonical frames)")
            args.aug_rot_deg, args.aug_crop_scale = 0.0, 1.0
        train_tokens = TokenCacheReader(args.feature_cache, train_df)
        got, total = train_tokens.coverage()
        if got < total:
            raise SystemExit(
                f"feature cache incomplete: {got}/{total} train videos "
                f"cached — run tools/cache_nr_features first")
        if len(val_df):
            val_tokens = TokenCacheReader(args.feature_cache, val_df)

    cfg = NRModelConfig(
        version=args.version,
        vit_model=args.vit_model,
        refine_up_depth=args.refine_up_depth,
        transformer_decoder_depth=args.transformer_decoder_depth,
        dropout_rate=args.dropout_rate,
        refine_scale1=args.refine_scale1,
        refine_scale2=args.refine_scale2,
        refine_scale3=args.refine_scale3,
        refine_scale4=args.refine_scale4,
        dists_pref2ref_coeff=args.dists_pref2ref_coeff,
        score_map_coeff=args.score_map_coeff,
        decoder_dtype=args.decoder_dtype,
        remat=args.remat,
        dists=DISTSConfig(compute_dtype=args.compute_dtype),
    )
    from nerf_qa_tpu.models.nr.vit import ViTS14

    model = NRModel(
        resolve_vgg_params(args.vgg_ckpt, seed=args.seed),
        dists_weights=resolve_dists_weights(cfg.dists, args.dists_weights),
        cfg=cfg,
        vit=ViTS14(depth=args.vit_depth),
        vit_params=resolve_vit_params(
            args.vit_ckpt, depth=args.vit_depth,
            grid_size=args.sem_size // 14,
        ),
        jbu_params=(resolve_jbu_params(args.jbu_ckpt)
                    if args.version >= 7 else None),
        render_size=args.render_size, sem_size=args.sem_size,
    )
    train_cfg = TrainConfig(
        lr=args.lr, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        epochs=args.epochs, batch_size=args.batch_size,
        schedule="constant", seed=args.seed,
    )
    loader = create_nr_dataloader(
        train_df, args.data_dir, mode=args.mode, is_train=True,
        batch_size=args.batch_size, num_workers=args.num_workers,
        seed=args.seed, aug_crop_scale=args.aug_crop_scale,
        aug_rot_deg=args.aug_rot_deg,
        render_size=args.render_size, sem_size=args.sem_size,
    )
    if distributed:
        hid, hcount = host_info()
        print(f"multi-host: process {hid}/{hcount}")
        loader.sampler = HostShardedSampler(loader.sampler)
    trainer = NRTrainer(model, train_cfg, steps_per_epoch=max(1, len(loader)))
    params, state, opt_state, rng = trainer.init()

    ckpt_dir = os.path.join(args.output_dir, "ckpt")
    start_epoch = 0
    if args.init_from:
        restored = restore_checkpoint(args.init_from)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.init_from}")
        _, ckpt = restored
        params = ckpt["params"]
        state = ckpt.get("state") or state
        opt_state = trainer.optimizer.init(params)
        if "dists_alpha_beta" in ckpt:
            # fine-tuned metric weights imported alongside the decoder
            # (compat/torch_nr): train against them, not the bundled ones
            import jax.numpy as jnp

            from nerf_qa_tpu.core.dists import DISTSWeights

            ab = ckpt["dists_alpha_beta"]
            model.dists_weights = DISTSWeights(
                jnp.asarray(ab["alpha"]), jnp.asarray(ab["beta"])
            )
            print("using the checkpoint's fine-tuned DISTS alpha/beta")
        print(f"initialized decoder params from {args.init_from}")
    if args.resume:
        restored = restore_checkpoint(ckpt_dir)
        if restored:
            start_epoch, ckpt = restored
            params, opt_state = ckpt["params"], ckpt["opt_state"]
            state = ckpt.get("state", state)
            print(f"resumed from epoch {start_epoch}")
    saver = PreemptionSaver(ckpt_dir, interval=None)

    agg = MetricAggregator("Train Metrics Dict", log_fn=sink)
    val_agg = MetricAggregator("Validation Metrics Dict", log_fn=sink)
    timer = StepTimer()

    for epoch in range(start_epoch, args.epochs):
        if hasattr(loader.sampler, "set_epoch"):
            loader.sampler.set_epoch(epoch)
        # double-buffered H2D: batches are already device-resident when
        # the jitted step dequeues them (decode/transfer overlap compute)
        for batch in device_prefetch(loader, buffer_size=2):
            gt, render = batch[0], batch[1]
            with record_function("model_inference"):
                if args.mode == "score-map":
                    # (gt, render, score_map, vid, frame) batches
                    params, state, opt_state, losses, rng = \
                        trainer.train_step_score_map(
                            params, state, opt_state, gt,
                            render["256x256"], render["224x224"],
                            batch[2], rng,
                        )
                else:
                    score_std = batch[2] if len(batch) > 2 else None
                    score_mean = batch[3] if len(batch) > 3 else None
                    toks = None
                    if train_tokens is not None:
                        toks = train_tokens.gather(
                            np.asarray(batch[4]), np.asarray(batch[5])
                        )
                    params, state, opt_state, losses, rng = \
                        trainer.train_step(
                            params, state, opt_state, gt,
                            render["256x256"], render["224x224"], rng,
                            score_std, score_mean, sem_tokens=toks,
                        )
            agg.add({k: float(v) for k, v in losses.items()})
            timer.tick()
        logs = agg.log_summary(epoch)
        print(f"epoch {epoch}: {logs}  ({timer.rate(args.batch_size):.1f} fr/s)")
        ckpt = {"params": params, "state": state, "opt_state": opt_state}
        if args.checkpoint_every and (epoch + 1) % args.checkpoint_every == 0:
            save_checkpoint(ckpt_dir, epoch + 1, ckpt)
        saver.maybe_save(epoch + 1, ckpt)

        if len(val_df) and (epoch + 1) % args.test_every == 0:
            val_loader = create_nr_dataloader(
                val_df, args.data_dir, mode="gt", is_train=False,
                batch_size=args.batch_size, num_workers=args.num_workers,
                render_size=args.render_size, sem_size=args.sem_size,
            )
            preds, targets = {}, {}
            for batch in val_loader:
                gt, render, _, dists_mean, vid = batch[:5]
                toks = None
                if val_tokens is not None:
                    toks = val_tokens.gather(
                        np.asarray(vid), np.asarray(batch[5])
                    )
                scores = trainer.score_frames(
                    params, state, render["256x256"], render["224x224"],
                    sem_tokens=toks,
                )
                for v, s, t in zip(np.asarray(vid), scores,
                                   np.asarray(dists_mean)):
                    preds.setdefault(int(v), []).append(float(s))
                    targets.setdefault(int(v), []).append(float(t))
            vp = np.array([np.mean(preds[v]) for v in sorted(preds)])
            vt = np.array([np.mean(targets[v]) for v in sorted(targets)])
            val_agg.add({"l1": float(np.abs(vp - vt).mean())})
            if len(vp) > 1:
                corr = compute_correlations(vp, vt)
                val_agg.add(corr)
            print("val:", val_agg.log_summary(epoch))

        if args.test_scores_csv and args.test_data_dir and \
                (epoch + 1) % args.test_every == 0:
            from nerf_qa_tpu.eval.nr_benchmark import (
                benchmark_report,
                score_benchmark_videos,
            )

            test_df = pd.read_csv(args.test_scores_csv)
            scores = score_benchmark_videos(
                lambda a, b: trainer.score_video(params, state, a, b,
                                                 args.batch_size),
                test_df, args.test_data_dir, args.test_max_frames,
                args.render_size, args.sem_size,
            )
            report = benchmark_report(test_df, scores)
            sink({f"Test Metrics Dict/{k}": v for k, v in report.items()},
                 epoch)
            print("test:", {k: round(v, 4) for k, v in report.items()})

    final_path = save_checkpoint(ckpt_dir, args.epochs,
                                 {"params": params, "state": state,
                                  "opt_state": opt_state})
    # run_final.py:328-336-style model Artifact upload (no-op sans wandb)
    log_artifact(final_path, name="nr_model", type="model")
    with open(os.path.join(args.output_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)


if __name__ == "__main__":
    main()
