"""Offline encoder-feature cache for the NR pipeline.

Reference behavior: nerf_qa/model.py:165-196 — a one-off ``__main__``
block iterates the NR dataset, runs the frozen encoder on each render,
and ``torch.save``s the feature list per frame into a ``features/``
directory beside each video's ``color/`` dir. Training can then skip the
frozen forward.

TPU design: the cache stores the *ViT patch tokens* — the sequential,
hardest-to-overlap part of the frozen encoder — rather than the full
feature pyramids. Tokens are tiny ((gh, gw, 384) ≈ 0.2 MB fp16/frame vs
~100 MB/frame for the full pyramids), so a whole dataset fits in page
cache; the VGG pyramid and JBU upsampling recompute on device, where
they are cheap MXU work that overlaps the decoder. One packed fp16
``.npy`` per video (memmap-read, so random frame access costs one page
fault, not a file open per frame) + a JSON sidecar with the layout —
instead of the reference's thousands of tiny pickles.

Cache correctness contract: tokens are computed from the dataset's
*canonical* (deterministic, un-augmented) 224² render — the same frames
``NerfNRQADataset(is_train=False)`` yields. Consumers must disable the
random augs (rot=0, crop_scale=1.0); ``tools/train_nr.py`` enforces
this when ``--feature-cache`` is given.
"""
from __future__ import annotations

import json
import os
from os import path

import numpy as np

META_SUFFIX = ".json"


def token_cache_path(cache_dir: str, render_dir: str) -> str:
    """Cache file for one video, mirroring the reference's layout
    (``features/`` beside the render dir, model.py:186-189) but rooted at
    ``cache_dir`` so read-only datasets stay untouched."""
    parent = path.dirname(render_dir.rstrip("/"))
    return path.join(cache_dir, parent, "features", "vit_tokens.npy")


def write_token_cache(cache_file: str, tokens: np.ndarray,
                      basenames: list[str]) -> None:
    """``tokens``: (n_frames, gh, gw, dim); stored fp16."""
    os.makedirs(path.dirname(cache_file), exist_ok=True)
    tokens = np.asarray(tokens, np.float16)
    np.save(cache_file, tokens)
    meta = {
        "shape": list(tokens.shape),
        "dtype": "float16",
        "basenames": list(basenames),
    }
    with open(cache_file + META_SUFFIX, "w") as f:
        json.dump(meta, f)


class TokenCacheReader:
    """Maps (video_idx, frame) -> cached tokens for one scores dataframe.

    Memmaps are opened lazily and kept; reads return fp32 arrays ready
    for the device."""

    def __init__(self, cache_dir: str, df):
        self.cache_dir = cache_dir
        self.render_dirs = df["render_dir"].tolist()
        self._maps: dict[int, np.ndarray] = {}

    def _video(self, video_idx: int) -> np.ndarray:
        m = self._maps.get(video_idx)
        if m is None:
            f = token_cache_path(self.cache_dir, self.render_dirs[video_idx])
            m = np.load(f, mmap_mode="r")
            self._maps[video_idx] = m
        return m

    def gather(self, video_idx: np.ndarray, frame: np.ndarray) -> np.ndarray:
        """Batch lookup -> (B, gh, gw, dim) fp32."""
        out = [
            np.asarray(self._video(int(v))[int(f)], np.float32)
            for v, f in zip(np.asarray(video_idx), np.asarray(frame))
        ]
        return np.stack(out)

    def coverage(self) -> tuple[int, int]:
        """(videos cached, videos total) — for startup validation."""
        n = 0
        for rd in self.render_dirs:
            if path.exists(token_cache_path(self.cache_dir, rd)):
                n += 1
        return n, len(self.render_dirs)
