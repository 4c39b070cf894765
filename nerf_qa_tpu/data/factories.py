"""Dataloader factory functions mirroring the reference's public API.

Reference behavior: create_test2_dataloader (data.py:174-188),
create_large_qa_dataloader (data.py:277-282),
create_nerf_qa_resize_dataloader (data.py:367-375),
create_test_video_dataloader (data.py:395-405).
"""
from __future__ import annotations

import numpy as np

from nerf_qa_tpu.data.datasets import (
    LargeQADataset,
    NeRFQAResizedDataset,
    NerfNRQADataset,
    Test2Dataset,
)
from nerf_qa_tpu.data.pipeline import DataLoader
from nerf_qa_tpu.data.samplers import SceneBalancedSampler
from nerf_qa_tpu.data.video import load_video_frames
from nerf_qa_tpu.settings import DEVICE_BATCH_SIZE_FR, DEVICE_BATCH_SIZE_NR


def create_test2_dataloader(scores_df, dir, batch_size=DEVICE_BATCH_SIZE_FR,
                            in_memory=False, scene_balanced=True,
                            num_workers=4, seed=0):
    dataset = Test2Dataset(dir=dir, scores_df=scores_df, in_memory=in_memory)
    sampler = (SceneBalancedSampler(dataset.get_scene_indices(), seed)
               if scene_balanced else None)
    return DataLoader(dataset, batch_size=batch_size, sampler=sampler,
                      num_workers=0 if in_memory else num_workers)


def create_large_qa_dataloader(scores_df, dir, resize=True,
                               batch_size=DEVICE_BATCH_SIZE_FR,
                               num_workers=5, seed=0):
    dataset = LargeQADataset(dir=dir, scores_df=scores_df, resize=resize)
    sampler = SceneBalancedSampler(dataset.get_scene_indices(), seed)
    return DataLoader(dataset, batch_size=batch_size, sampler=sampler,
                      num_workers=num_workers)


def create_nerf_qa_resize_dataloader(scores_df, dir,
                                     batch_size=DEVICE_BATCH_SIZE_FR,
                                     scene_balanced=True, num_workers=4,
                                     seed=0):
    dataset = NeRFQAResizedDataset(dir=dir, scores_df=scores_df,
                                   rng=np.random.default_rng(seed))
    sampler = (SceneBalancedSampler(dataset.get_scene_indices(), seed)
               if scene_balanced else None)
    return DataLoader(dataset, batch_size=batch_size, sampler=sampler,
                      num_workers=num_workers)


def create_nr_dataloader(scores_df, dir, mode="gt", is_train=False,
                         batch_size=DEVICE_BATCH_SIZE_NR, num_workers=4,
                         seed=0, **aug):
    dataset = NerfNRQADataset(scores_df, dir=dir, mode=mode,
                              is_train=is_train,
                              rng=np.random.default_rng(seed), **aug)
    sampler = SceneBalancedSampler(dataset.get_scene_indices(), seed)
    return DataLoader(dataset, batch_size=batch_size, sampler=sampler,
                      num_workers=num_workers)


def create_test_video_dataloader(row, dir, resize=True,
                                 keep_aspect_ratio=False,
                                 batch_size=DEVICE_BATCH_SIZE_FR):
    """Load both videos of one benchmark row and return (dist, ref) frame
    stacks (data.py:395-405)."""
    import os.path as path

    ref_path = path.join(dir, "Reference", row["reference_filename"])
    dist_path = path.join(dir, "NeRF-QA_videos", row["distorted_filename"])
    ref = load_video_frames(ref_path, resize=resize,
                            keep_aspect_ratio=keep_aspect_ratio)
    dist = load_video_frames(dist_path, resize=resize,
                             keep_aspect_ratio=keep_aspect_ratio)
    return dist, ref
