"""Index samplers and batching logic (pure host-side numpy).

Reference behavior: SceneBalancedSampler (data.py:407-427) — every epoch
draws min-scene-count indices per scene, shuffled; ComputeBatchSampler
(data.py:241-273) — size-bucketed batches for ragged datasets.

TPU-first: explicit numpy Generators (deterministic under per-host
sharding — each host derives its generator from (seed, host_id, epoch)),
plus a host_shard helper for multi-host input sharding.
"""
from __future__ import annotations

from typing import Iterator, Mapping, Sequence

import numpy as np


class SceneBalancedSampler:
    """Equal per-scene sampling at the min scene count (data.py:407-427)."""

    def __init__(self, scene_indices: Mapping[str, Sequence[int]],
                 seed: int = 0):
        self.scene_indices = {k: np.asarray(v) for k, v in scene_indices.items()}
        self.samples_per_scene = min(len(v) for v in self.scene_indices.values())
        self.num_samples = self.samples_per_scene * len(self.scene_indices)
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        return self.num_samples

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng((self.seed, self.epoch))
        picked = []
        for indices in self.scene_indices.values():
            perm = rng.permutation(len(indices))[: self.samples_per_scene]
            picked.extend(indices[perm].tolist())
        picked = np.asarray(picked)
        yield from picked[rng.permutation(len(picked))].tolist()


class ComputeBatchSampler:
    """Size-bucketed batches (data.py:241-273): group indices by image
    shape so every batch is shape-uniform (one XLA compile per bucket)."""

    def __init__(self, shapes: Sequence[tuple], batch_size: int, seed: int = 0):
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0
        buckets: dict[tuple, list[int]] = {}
        for i, s in enumerate(shapes):
            buckets.setdefault(tuple(s), []).append(i)
        self.batches = []
        for indices in buckets.values():
            for lo in range(0, len(indices), batch_size):
                self.batches.append(indices[lo:lo + batch_size])

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self.epoch))
        for i in rng.permutation(len(self.batches)):
            yield self.batches[i]


def host_shard(indices: Sequence[int], host_id: int, host_count: int) -> list[int]:
    """Deterministic per-host slice of a sampler's index stream (the
    multi-host input sharding in SURVEY §5.8's design)."""
    return list(indices)[host_id::host_count]
