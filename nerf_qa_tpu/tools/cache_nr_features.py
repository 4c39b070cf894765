"""Precompute the NR encoder feature cache (offline activation dump).

Reference behavior: nerf_qa/model.py:165-196 — iterate the NR dataset,
run the frozen encoder per render, ``torch.save`` features per frame
into ``features/`` beside each video. This tool is the TPU equivalent:
it runs the frozen ViT over every video's canonical (un-augmented) 224²
renders in fixed-shape device batches and writes one packed fp16 token
memmap per video (data/feature_cache.py layout). ``tools/train_nr.py
--feature-cache`` then skips the ViT forward in every train step.

Usage:
  python -m nerf_qa_tpu.tools.cache_nr_features \
      --data-dir <NeRF-NR-QA root> --scores-csv output.csv \
      --cache-dir <out root> [--vit-ckpt dinov2.pth]
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from nerf_qa_tpu.compat.pretrained import add_backbone_args, resolve_vit_params
from nerf_qa_tpu.data.datasets import NerfNRQADataset
from nerf_qa_tpu.data.feature_cache import token_cache_path, write_token_cache
from nerf_qa_tpu.data.pipeline import DataLoader
from nerf_qa_tpu.models.nr.vit import ViTS14


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="NR ViT-token cache builder")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--scores-csv", required=True)
    p.add_argument("--cache-dir", required=True,
                   help="cache root (features/ trees are created under "
                        "it, mirroring render_dir parents)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--sem-size", type=int, default=224)
    p.add_argument("--vit-depth", type=int, default=12)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--overwrite", action="store_true")
    add_backbone_args(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    df = pd.read_csv(args.scores_csv)
    vit = ViTS14(depth=args.vit_depth)
    vit_params = resolve_vit_params(
        args.vit_ckpt, depth=args.vit_depth, grid_size=args.sem_size // 14
    )
    if vit_params is None:  # random-weight fallback (smoke runs)
        dummy = jnp.zeros((1, args.sem_size, args.sem_size, 3), jnp.float32)
        vit_params = vit.init(jax.random.PRNGKey(0), dummy)["params"]

    @jax.jit
    def tokens_fn(imgs):
        out = vit.apply({"params": vit_params}, imgs)
        gh, gw = out["grid"]
        return out["x_norm_patchtokens"].reshape(
            imgs.shape[0], gh, gw, -1
        ).astype(jnp.float16)

    bs = args.batch_size
    t0 = time.time()
    n_frames = 0
    for video_idx in range(len(df)):
        row = df.iloc[video_idx]
        out_file = token_cache_path(args.cache_dir, row["render_dir"])
        if os.path.exists(out_file) and not args.overwrite:
            continue
        video_df = df.iloc[video_idx:video_idx + 1].reset_index(drop=True)
        ds = NerfNRQADataset(video_df, dir=args.data_dir, mode="gt",
                             is_train=False, sem_size=args.sem_size)
        # default sampler iterates 0..len-1 in order — frame order in the
        # cache matches the dataset's frame index
        loader = DataLoader(ds, batch_size=bs,
                            num_workers=args.num_workers)
        chunks = []
        for batch in loader:
            r224 = np.asarray(batch[1]["224x224"])
            n = r224.shape[0]
            if n < bs:  # pad to the compiled shape, trim after
                r224 = np.concatenate(
                    [r224, np.repeat(r224[-1:], bs - n, 0)]
                )
            chunks.append(np.asarray(tokens_fn(jnp.asarray(r224)))[:n])
        tokens = np.concatenate(chunks)
        from nerf_qa_tpu.data.datasets import parse_list_column
        write_token_cache(out_file, tokens,
                          parse_list_column(row["basenames"]))
        n_frames += tokens.shape[0]
        print(f"[{video_idx + 1}/{len(df)}] {out_file}: "
              f"{tokens.shape} fp16")
    dt = time.time() - t0
    print(f"cached {n_frames} frames in {dt:.1f}s "
          f"({n_frames / max(dt, 1e-9):.1f} fr/s)")


if __name__ == "__main__":
    main()
