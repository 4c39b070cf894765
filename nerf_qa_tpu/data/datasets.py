"""Host-side frame datasets.

Reference behavior: nerf_qa/data.py (573 LoC) + data_fr.py. The designs
rebuilt here:

* cumulative frame-count indexing: videos flatten into one global frame
  index (data.py:92-93,126-133)
* Test2Dataset: paired Reference/Renders frame trees + per-video MOS
  (data.py:86-171), optional uint8 in-memory cache with reference-frame
  dedup (data.py:104-120)
* LargeQADataset: NeRF-QA-Large trees with %03d frame names
  (data.py:190-227)
* NeRFQAResizedDataset: paired random resize + random crop augmentation
  (data.py:285-364)
* NerfNRQADataset: NR dataset with gt/render/score-map modes, per-frame
  DISTS std/mean targets, paired rotation + center/random crop augs
  (data.py:431-554)
* Test2DatasetVideo: per-video paired dict batches at 256²+224²
  (data.py:42-84)

TPU-first differences: datasets return NHWC numpy (uint8 where possible —
the device pipeline normalizes), all augmentation randomness flows
through explicit numpy Generators (deterministic under per-host
sharding), and list-typed CSV columns are parsed with ast.literal_eval
instead of eval.
"""
from __future__ import annotations

import ast
import os
from os import path
from typing import Sequence

import numpy as np

from nerf_qa_tpu.data.imaging import (
    load_image_rgb,
    load_prepared,
    load_resized,
    paired_random_crop,
    paired_random_resize,
    paired_rotate,
    prepare_image,
    resize_image,
)


def parse_list_column(value):
    """Parse a stringified list CSV cell (the reference uses eval;
    data.py:467-472)."""
    if isinstance(value, str):
        return ast.literal_eval(value)
    return value


class FrameIndexed:
    """Cumulative frame-count video->frame indexing base
    (data.py:92-93,126-133)."""

    def __init__(self, frame_counts: Sequence[int]):
        self.frame_counts = np.asarray(frame_counts, np.int64)
        self.cumulative = np.cumsum(self.frame_counts)
        self.total = int(self.cumulative[-1]) if len(self.cumulative) else 0

    def __len__(self) -> int:
        return self.total

    def locate(self, idx: int) -> tuple[int, int]:
        """Global frame index -> (video_idx, frame_within_video)."""
        video_idx = int(np.searchsorted(self.cumulative, idx, side="right"))
        frame = idx - (self.cumulative[video_idx - 1] if video_idx > 0 else 0)
        return video_idx, int(frame)

    def scene_indices(self, scenes: Sequence[str]) -> dict[str, list[int]]:
        """Scene -> global frame indices (data.py:161-171)."""
        out: dict[str, list[int]] = {}
        start = 0
        for scene, count in zip(scenes, self.frame_counts):
            out.setdefault(scene, []).extend(range(start, start + int(count)))
            start += int(count)
        return out


def _listdir_frames(folder: str) -> list[str]:
    files = [f for f in os.listdir(folder) if f.endswith((".jpg", ".png"))]
    files.sort()
    return files


class Test2Dataset(FrameIndexed):
    """Paired Reference/Renders frame trees (data.py:86-171)."""

    def __init__(self, dir: str, scores_df, in_memory: bool = False,
                 resize: bool = True):
        self.ref_dir = path.join(dir, "Reference")
        self.dist_dir = path.join(dir, "Renders")
        self.scores_df = scores_df
        self.resize = resize
        self.render_files = [
            _listdir_frames(path.join(self.dist_dir, row["distorted_folder"]))
            for _, row in scores_df.iterrows()
        ]
        self.gt_files = [
            _listdir_frames(path.join(self.ref_dir, row["reference_folder"]))
            for _, row in scores_df.iterrows()
        ]
        super().__init__([len(f) for f in self.gt_files])
        self._cache: dict[int, tuple] = {}
        self._ref_cache: dict[tuple, np.ndarray] = {}
        self.in_memory = in_memory
        if in_memory:
            for i in range(len(self)):
                self[i]

    def __getitem__(self, idx: int):
        video_idx, frame = self.locate(idx)
        row = self.scores_df.iloc[video_idx]
        if self.in_memory and idx in self._cache:
            dist_u8, score = self._cache[idx]
            ref_u8 = self._ref_cache[(row["reference_folder"], frame)]
            return (
                dist_u8.astype(np.float32) / 255.0,
                ref_u8.astype(np.float32) / 255.0,
                score,
                video_idx,
            )
        dist_path = path.join(self.dist_dir, row["distorted_folder"],
                              self.render_files[video_idx][frame])
        ref_path = path.join(self.ref_dir, row["reference_folder"],
                             self.gt_files[video_idx][frame])
        # prepare_image semantics: resize only when min side > 256
        # (data.py:154-155 -> DISTS_pt.py:210-217); native decode+resize
        # when the C++ layer is built
        dist = load_prepared(dist_path, resize=self.resize)
        ref = load_prepared(ref_path, resize=self.resize)
        score = float(row["MOS"])
        if self.in_memory:
            # quantized uint8 cache, reference frames deduped
            self._cache[idx] = ((dist * 255).astype(np.uint8), score)
            key = (row["reference_folder"], frame)
            if key not in self._ref_cache:
                self._ref_cache[key] = (ref * 255).astype(np.uint8)
        return dist, ref, score, video_idx

    def get_scene_indices(self):
        return self.scene_indices(self.scores_df["distorted_folder"].tolist())


class LargeQADataset(FrameIndexed):
    """NeRF-QA-Large frame trees (data.py:190-227)."""

    def __init__(self, dir: str, scores_df, resize: bool = True):
        self.ref_dir = path.join(dir, "references")
        self.dist_dir = path.join(dir, "nerf-renders")
        self.scores_df = scores_df
        self.resize = resize
        super().__init__(scores_df["frame_count"].tolist())

    def __getitem__(self, idx: int):
        video_idx, frame = self.locate(idx)
        row = self.scores_df.iloc[video_idx]
        dist = load_prepared(
            path.join(self.dist_dir, row["distorted_filename"],
                      f"{frame:03d}.png"), resize=self.resize,
        )
        ref = load_prepared(
            path.join(self.ref_dir, row["referenced_filename"],
                      f"{frame:03d}.png"), resize=self.resize,
        )
        return dist, ref, float(row["MOS"]), video_idx

    def get_scene_indices(self):
        return self.scene_indices(self.scores_df["distorted_filename"].tolist())


class NeRFQAResizedDataset(FrameIndexed):
    """Original-size frames + paired random resize/crop augmentation
    (data.py:285-364)."""

    def __init__(self, dir: str, scores_df, rng: np.random.Generator | None = None):
        self.ref_dir = path.join(dir, "Reference")
        self.dist_dir = path.join(dir, "NeRF-QA_videos")
        self.scores_df = scores_df.copy()
        self.rng = rng or np.random.default_rng(0)
        self.scores_df["distorted_folder"] = self.scores_df[
            "distorted_filename"
        ].apply(lambda x: os.path.splitext(x)[0])
        self.scores_df["reference_folder"] = self.scores_df[
            "reference_filename"
        ].apply(lambda x: os.path.splitext(x)[0])
        counts = []
        for _, row in self.scores_df.iterrows():
            files = _listdir_frames(
                path.join(self.ref_dir, row["reference_folder"], "256x256")
            )
            counts.append(len(files))
        super().__init__(counts)

    def __getitem__(self, idx: int):
        video_idx, frame = self.locate(idx)
        row = self.scores_df.iloc[video_idx]
        dist = load_image_rgb(
            path.join(self.dist_dir, row["distorted_folder"], "original_size",
                      f"{frame:03d}.png")
        )
        ref = load_image_rgb(
            path.join(self.ref_dir, row["reference_folder"], "original_size",
                      f"{frame:03d}.png")
        )
        dist, ref = paired_random_resize(dist, ref, 256, self.rng)
        dist, ref = paired_random_crop(dist, ref, 256, 256, self.rng)
        return dist, ref, float(row["MOS"]), video_idx

    def get_scene_indices(self):
        return self.scene_indices(self.scores_df["distorted_folder"].tolist())


class NerfNRQADataset(FrameIndexed):
    """NR dataset: gt/render/score-map modes + per-frame DISTS stats
    (data.py:431-554)."""

    def __init__(
        self,
        df,
        dir: str,
        mode: str = "render",
        is_train: bool = False,
        aug_crop_scale: float = 0.8,
        aug_rot_deg: float = 30.0,
        rng: np.random.Generator | None = None,
        render_size: int = 256,
        sem_size: int = 224,
    ):
        self.dir = dir
        self.df = df
        self.mode = mode
        self.is_train = is_train
        self.aug_crop_scale = aug_crop_scale
        self.aug_rot_deg = aug_rot_deg
        self.rng = rng or np.random.default_rng(0)
        # network input resolutions (data.py:490-494 fixes 256/224; kept
        # configurable for ablations and low-res smoke runs)
        self.render_size = render_size
        self.sem_size = sem_size
        super().__init__(df["frame_count"].tolist())

    def get_scene_indices(self):
        return self.scene_indices(self.df["scene"].tolist())

    def _transform_pair(self, render: np.ndarray, gt: np.ndarray):
        """Paired rotation + 0.7 center crop (+ random crop when training)
        (data.py:508-531)."""
        if self.is_train and self.aug_rot_deg > 0:
            angle = float(self.rng.uniform(-self.aug_rot_deg, self.aug_rot_deg))
            render = paired_rotate(render, angle)
            gt = paired_rotate(gt, angle)
        h, w = render.shape[:2]
        ch, cw = int(h * 0.7), int(w * 0.7)
        i, j = (h - ch) // 2, (w - cw) // 2
        render = render[i:i + ch, j:j + cw]
        gt = gt[i:i + ch, j:j + cw]
        if self.is_train:
            crop = int(self.aug_crop_scale * ch), int(self.aug_crop_scale * cw)
            render, gt = paired_random_crop(render, gt, crop[0], crop[1],
                                            self.rng)
        return render, gt

    def __getitem__(self, idx: int):
        video_idx, frame = self.locate(idx)
        row = self.df.iloc[video_idx]
        basenames = parse_list_column(row["basenames"])
        basename = basenames[frame]
        render_dir = row["render_dir"]
        render = load_image_rgb(path.join(self.dir, render_dir, basename))
        gt = load_image_rgb(path.join(self.dir, row["gt_dir"], basename))
        render, gt = self._transform_pair(render, gt)
        rs, ss = self.render_size, self.sem_size
        render_256 = resize_image(render, rs, rs)
        render_224 = resize_image(render, ss, ss)
        gt_256 = resize_image(gt, rs, rs)
        render_pack = {"256x256": render_256, "224x224": render_224}
        if self.mode == "score-map":
            if os.path.basename(render_dir) == "color":
                sm_dir = path.join(os.path.dirname(render_dir), "score-map")
            else:
                sm_dir = path.join(os.path.dirname(render_dir), "gt-score-map")
            score_map = load_image_rgb(path.join(self.dir, sm_dir, basename))
            log_min = parse_list_column(row["score_map_log_min"])[frame]
            log_max = parse_list_column(row["score_map_log_max"])[frame]
            score_map = score_map.copy()
            if score_map.shape[-1] == 1:
                score_map = (log_max - log_min) * score_map + log_min
            else:
                score_map[..., 1] = (log_max - log_min) * score_map[..., 1] + log_min
            return gt_256, render_pack, score_map, video_idx, frame
        dists_std = parse_list_column(row["DISTS_std"])[frame]
        dists_mean = parse_list_column(row["DISTS_mean"])[frame]
        return gt_256, render_pack, np.float32(dists_std), np.float32(dists_mean), video_idx, frame


class Test2VideoDataset:
    """Per-video paired dict frames at 256²+224² (data.py:42-84)."""

    def __init__(self, row, dir: str):
        gt_dir = path.join(dir, "Reference", row["distorted_folder"])
        render_dir = path.join(dir, "Renders", row["reference_folder"])
        self.files = list(zip(
            [path.join(gt_dir, f) for f in _listdir_frames(gt_dir)],
            [path.join(render_dir, f) for f in _listdir_frames(render_dir)],
        ))

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        gt_path, render_path = self.files[idx]

        def pack(p):
            return {
                "256x256": load_resized(p, 256, 256),
                "224x224": load_resized(p, 224, 224),
            }

        return pack(gt_path), pack(render_path)
