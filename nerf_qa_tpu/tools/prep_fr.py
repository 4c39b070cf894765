"""FR dataset statistics prep.

Reference behavior: prep.py / test2_prep.py / data_prep.py — per video,
compute DISTS (+ADISTS) mean/std/min/max and per-frame score lists under
multiple resize policies (aspect-preserving 256, square 256x256,
full-size, equal-pixel-count H*W≈256²; test2_prep.py:109-114,221-227,
421-435), writing enriched score CSVs (scores_aspect.csv etc.).

TPU design: frames batch through one jitted scorer per (policy, shape)
bucket; full-size / aspect policies produce shape-bucketed compiles.
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np
import pandas as pd

from nerf_qa_tpu.compat.pretrained import (
    add_backbone_args,
    resolve_dists_weights,
    resolve_vgg_params,
)
from nerf_qa_tpu.config import ADISTSConfig, DISTSConfig
from nerf_qa_tpu.core import adists, dists
from nerf_qa_tpu.data.imaging import load_image_rgb, resize_image, resize_shortest_side

POLICIES = ("aspect", "square", "full_size", "pixel_count")


def apply_policy(img: np.ndarray, policy: str) -> np.ndarray:
    """The four resize policies of test2_prep.py."""
    h, w = img.shape[:2]
    if policy == "square":
        return resize_image(img, 256, 256)
    if policy == "aspect":
        return resize_shortest_side(img, 256) if min(h, w) > 256 else img
    if policy == "pixel_count":
        # equal pixel count: scale so H*W ~= 256^2 (test2_prep.py:421-435)
        scale = math.sqrt(256 * 256 / (h * w))
        return resize_image(img, max(1, round(h * scale)),
                            max(1, round(w * scale)))
    return img  # full_size


class PairScorer:
    """Shape-bucketed jitted DISTS/ADISTS pair scorer."""

    def __init__(self, compute_dtype="bfloat16", with_adists=True,
                 vgg_ckpt=None, dists_weights=None, iqa_metrics=(),
                 lpips_ckpt=None, stlpips_ckpt=None):
        import jax

        self.dcfg = DISTSConfig(compute_dtype=compute_dtype)
        self.vgg_params = resolve_vgg_params(vgg_ckpt, seed=0)
        self.weights = resolve_dists_weights(self.dcfg, dists_weights)
        self.acfg = ADISTSConfig(compute_dtype=compute_dtype)
        self.with_adists = with_adists

        @jax.jit
        def d_score(x, y):
            return dists.forward(self.vgg_params, self.weights, x, y, self.dcfg)

        @jax.jit
        def a_score(x, y):
            return adists.forward(self.vgg_params, x, y, self.acfg,
                                  as_loss=False)

        self._d = d_score
        self._a = a_score
        # comparison-metric columns (prep.py:344-394's PSNR/SSIM/LPIPS
        # correlation table inputs), computed natively (eval.iqa)
        self._iqa = {}
        if iqa_metrics:
            from nerf_qa_tpu.compat.pretrained import resolve_lpips_weights
            from nerf_qa_tpu.eval import iqa

            for name in iqa_metrics:
                if name == "psnr":
                    self._iqa["PSNR"] = jax.jit(iqa.psnr)
                elif name == "ssim":
                    self._iqa["SSIM"] = jax.jit(iqa.ssim)
                elif name == "ms-ssim":
                    self._iqa["MS-SSIM"] = jax.jit(iqa.ms_ssim)
                elif name == "lpips":
                    lin = resolve_lpips_weights(lpips_ckpt)
                    self._iqa["LPIPS"] = jax.jit(
                        lambda x, y, _lin=lin: iqa.lpips(
                            self.vgg_params, x, y, _lin))
                elif name == "st-lpips":
                    from nerf_qa_tpu.compat.pretrained import (
                        resolve_stlpips_weights,
                    )

                    st_lin = resolve_stlpips_weights(stlpips_ckpt)
                    self._iqa["ST-LPIPS"] = jax.jit(
                        lambda x, y, _lin=st_lin: iqa.st_lpips(
                            self.vgg_params, x, y, _lin))
                elif name == "gmsd":
                    self._iqa["GMSD"] = jax.jit(iqa.gmsd)
                elif name == "vif":
                    # VIF's reference argument comes first
                    self._iqa["VIF"] = jax.jit(lambda d, r: iqa.vif(r, d))
                elif name == "fsim":
                    self._iqa["FSIM"] = jax.jit(iqa.fsim)
                elif name == "fsimc":
                    self._iqa["FSIMc"] = jax.jit(iqa.fsimc)
                elif name == "nlpd":
                    # pyramid depth clamped to the frame size at trace
                    # time (aspect/full_size frames can be small; the
                    # default 6 levels need min side >= 96)
                    def _nlpd_auto(d, r):
                        levels = iqa.nlpd_max_levels(*d.shape[1:3])
                        return iqa.nlpd(d, r, levels=levels)

                    self._iqa["NLPD"] = jax.jit(_nlpd_auto)
                elif name == "mad":
                    # MAD's contrast-masking model derives from its
                    # FIRST argument (the reference) — swap like VIF
                    self._iqa["MAD"] = jax.jit(lambda d, r: iqa.mad(r, d))
                else:
                    raise SystemExit(f"unknown --iqa metric {name!r}")

    def score_pairs(self, ref: np.ndarray, render: np.ndarray):
        import jax.numpy as jnp

        r = jnp.asarray(ref)
        d = jnp.asarray(render)
        out = {"DISTS": np.asarray(self._d(d, r))}
        if self.with_adists:
            out["ADISTS"] = np.asarray(self._a(r, d))
        for key, fn in self._iqa.items():
            out[key] = np.asarray(fn(d, r))
        return out


def prep_video(scorer: PairScorer, ref_dir: str, render_dir: str,
               policy: str, batch_size: int = 8) -> dict:
    ref_files = sorted(f for f in os.listdir(ref_dir)
                       if f.endswith((".png", ".jpg")))
    render_files = sorted(f for f in os.listdir(render_dir)
                          if f.endswith((".png", ".jpg")))
    scores: dict[str, list] = {}
    for lo in range(0, len(ref_files), batch_size):
        refs = np.stack([
            apply_policy(load_image_rgb(os.path.join(ref_dir, f)), policy)
            for f in ref_files[lo:lo + batch_size]
        ])
        renders = np.stack([
            apply_policy(load_image_rgb(os.path.join(render_dir, f)), policy)
            for f in render_files[lo:lo + batch_size]
        ])
        for key, vals in scorer.score_pairs(refs, renders).items():
            scores.setdefault(key, []).extend(vals.tolist())
    out = {}
    for key, vals in scores.items():
        arr = np.asarray(vals)
        out[f"{key}"] = float(arr.mean())
        out[f"{key}_std"] = float(arr.std())
        out[f"{key}_min"] = float(arr.min())
        out[f"{key}_max"] = float(arr.max())
        out[f"{key}_frames"] = str([round(float(v), 6) for v in arr])
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Precompute DISTS/ADISTS stats")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--scores-csv", required=True)
    p.add_argument("--policy", default="square", choices=POLICIES)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--no-adists", action="store_true")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--output-csv", default=None)
    p.add_argument("--iqa", default="",
                   help="comma-separated comparison-metric columns to add "
                        "(psnr,ssim,ms-ssim,lpips,st-lpips,gmsd,vif,fsim,"
                        "fsimc,nlpd,mad) — "
                        "the reference "
                        "consumed these from external CSVs "
                        "(prep.py:344-394); computed natively here")
    p.add_argument("--lpips-ckpt", default=None,
                   help="official lpips vgg.pth lin weights "
                        "($NERF_QA_LPIPS_CKPT); without it LPIPS uses "
                        "uniform channel weights")
    p.add_argument("--stlpips-ckpt", default=None,
                   help="official ShiftTolerant-LPIPS vgg lin weights "
                        "($NERF_QA_STLPIPS_CKPT); without it ST-LPIPS "
                        "uses uniform channel weights")
    add_backbone_args(p)
    args = p.parse_args(argv)

    df = pd.read_csv(args.scores_csv)
    scorer = PairScorer(args.compute_dtype, with_adists=not args.no_adists,
                        vgg_ckpt=args.vgg_ckpt,
                        dists_weights=args.dists_weights,
                        iqa_metrics=tuple(
                            m for m in args.iqa.split(",") if m),
                        lpips_ckpt=args.lpips_ckpt,
                        stlpips_ckpt=args.stlpips_ckpt)
    rows = []
    for _, row in df.iterrows():
        ref_dir = os.path.join(args.data_dir, "Reference", row["reference_folder"])
        render_dir = os.path.join(args.data_dir, "Renders", row["distorted_folder"])
        stats = prep_video(scorer, ref_dir, render_dir, args.policy,
                           args.batch_size)
        rows.append({**row.to_dict(), **stats})
        print(row["distorted_folder"], {k: round(v, 4) for k, v in stats.items()
                                        if isinstance(v, float)})
    out_csv = args.output_csv or args.scores_csv.replace(
        ".csv", f"_{args.policy}.csv"
    )
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    print("wrote", out_csv)


if __name__ == "__main__":
    main()
