"""NR dataset prep: per-frame DISTS scores, scene-level stats, score maps.

Reference behavior: nerf_qa/nerf_nr_qa_prep.py (+_2/_3/_4) — walk
NeRF-NR-QA render trees computing per-frame DISTS scores -> output.csv
(_2.py:26-70); add per-scene across-method DISTS std/mean columns
(_3.py:27-44); generate 3-channel ADISTS score-map PNGs with -log10
encoding into 0-255 using per-frame log_min/log_max (_4.py:101-135).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
from PIL import Image

from nerf_qa_tpu.config import ADISTSConfig
from nerf_qa_tpu.core import adists
from nerf_qa_tpu.data.imaging import load_image_rgb, load_resized, resize_image
from nerf_qa_tpu.tools.prep_fr import PairScorer


def walk_render_tree(root: str):
    """Yield (scene, method, color_dir, gt_dir) for <scene>/<method>/color
    layouts (_2.py:26-70)."""
    for scene in sorted(os.listdir(root)):
        scene_dir = os.path.join(root, scene)
        if not os.path.isdir(scene_dir):
            continue
        gt_dir = os.path.join(scene_dir, "gt")
        if not os.path.isdir(gt_dir):
            continue
        for method in sorted(os.listdir(scene_dir)):
            color_dir = os.path.join(scene_dir, method, "color")
            if os.path.isdir(color_dir):
                yield scene, method, color_dir, gt_dir


def compute_frame_scores(scorer: PairScorer, color_dir: str, gt_dir: str,
                         batch_size: int = 8):
    names = sorted(f for f in os.listdir(color_dir)
                   if f.endswith((".png", ".jpg")))
    scores = []
    for lo in range(0, len(names), batch_size):
        chunk = names[lo:lo + batch_size]
        renders = np.stack([
            load_resized(os.path.join(color_dir, n), 256, 256) for n in chunk
        ])
        gts = np.stack([
            load_resized(os.path.join(gt_dir, n), 256, 256) for n in chunk
        ])
        scores.extend(scorer.score_pairs(gts, renders)["DISTS"].tolist())
    return names, np.asarray(scores)


def add_scene_stats(df: pd.DataFrame) -> pd.DataFrame:
    """Per-scene across-method per-frame DISTS std/mean (_3.py:27-44)."""
    df = df.copy()
    stds, means = [], []
    for _, row in df.iterrows():
        group = df[df["scene"] == row["scene"]]
        per_method = np.stack([
            np.asarray(eval(r["DISTS_frames"])) for _, r in group.iterrows()
        ])
        stds.append(str([round(float(v), 6) for v in per_method.std(axis=0)]))
        means.append(str([round(float(v), 6) for v in per_method.mean(axis=0)]))
    df["DISTS_std"] = stds
    df["DISTS_mean"] = means
    return df


def write_score_maps(vgg_params, color_dir: str, gt_dir: str, out_dir: str,
                     cfg: ADISTSConfig = ADISTSConfig()):
    """-log10-encoded ADISTS distortion-map PNGs (_4.py:101-135): channel
    0 = scene-mean map, 1 = frame map (log-scaled), 2 = across-method std
    map; here the frame map plus its log range columns."""
    import jax
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def amap(x, y):
        return adists.forward(vgg_params, x, y, cfg, as_map=True)

    names = sorted(f for f in os.listdir(color_dir)
                   if f.endswith((".png", ".jpg")))
    log_mins, log_maxs = [], []
    for n in names:
        render = resize_image(load_image_rgb(os.path.join(color_dir, n)), 256, 256)
        gt = resize_image(load_image_rgb(os.path.join(gt_dir, n)), 256, 256)
        dist_map = np.asarray(amap(jnp.asarray(gt[None]),
                                   jnp.asarray(render[None])))[0]
        dist_map = np.clip(dist_map, 1e-6, None)
        logm = -np.log10(dist_map)
        lo, hi = float(logm.min()), float(logm.max())
        enc = ((logm - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
        Image.fromarray(enc, "L").save(os.path.join(out_dir, n))
        log_mins.append(round(lo, 6))
        log_maxs.append(round(hi, 6))
    return log_mins, log_maxs


def main(argv=None):
    p = argparse.ArgumentParser(description="NR dataset prep")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--output-csv", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--score-maps", action="store_true")
    p.add_argument("--compute-dtype", default="bfloat16")
    from nerf_qa_tpu.compat.pretrained import add_backbone_args

    add_backbone_args(p)
    args = p.parse_args(argv)

    scorer = PairScorer(args.compute_dtype, with_adists=False,
                        vgg_ckpt=args.vgg_ckpt,
                        dists_weights=args.dists_weights)
    rows = []
    for scene, method, color_dir, gt_dir in walk_render_tree(args.data_dir):
        names, scores = compute_frame_scores(scorer, color_dir, gt_dir,
                                             args.batch_size)
        row = {
            "scene": scene,
            "method": method,
            "frame_count": len(names),
            "basenames": str(names),
            "DISTS_frames": str([round(float(s), 6) for s in scores]),
            "render_dir": os.path.relpath(color_dir, args.data_dir),
            "gt_dir": os.path.relpath(gt_dir, args.data_dir),
        }
        if args.score_maps:
            out_dir = os.path.join(os.path.dirname(color_dir), "score-map")
            log_mins, log_maxs = write_score_maps(
                scorer.vgg_params, color_dir, gt_dir, out_dir,
                ADISTSConfig(compute_dtype=args.compute_dtype),
            )
            row["score_map_log_min"] = str(log_mins)
            row["score_map_log_max"] = str(log_maxs)
        rows.append(row)
        print(scene, method, "mean DISTS", float(scores.mean()))
    df = add_scene_stats(pd.DataFrame(rows))
    out_csv = args.output_csv or os.path.join(args.data_dir, "output.csv")
    df.to_csv(out_csv, index=False)
    print("wrote", out_csv)


if __name__ == "__main__":
    main()
