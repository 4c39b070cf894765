"""Device mesh + sharding layer.

The reference has no distributed logic (single CUDA device,
SURVEY §5.8); this is the TPU-native replacement: a 1-axis ``data`` mesh
over ICI for frame/batch parallelism (FR/NR workloads are tiny-model,
big-data — pure data parallel is the speed-of-light layout), with room
for a second ``model`` axis for channel-sharded full-resolution scoring.

All helpers are thin wrappers over jax.sharding so callers never touch
device lists directly.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """1-axis data mesh by default; optional 2nd 'model' axis.

    ``model_parallel`` must divide the device count; the data axis gets
    the rest.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard the batch/frame axis (position ``axis``) over the data axis."""
    return NamedSharding(mesh, P(*((None,) * axis), DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with the leading axis data-sharded."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
