"""Multi-host (pod) initialization + per-host input sharding.

The reference is single-process (SURVEY §5.8); this is the TPU-pod
extension of the data-parallel design: ``jax.distributed.initialize``
from standard cluster env vars, a global mesh spanning all hosts'
devices, and per-host dataloader sharding through
``data.samplers.host_shard`` so each host decodes only its slice of the
frame stream (the same pjit program runs everywhere; DCN only carries
gradient all-reduce spillover, scoring reductions ride ICI).

Single-host processes are a no-op (process_count == 1), so every code
path below is exercised by the regular test environment.
"""
from __future__ import annotations

import os

import jax

from nerf_qa_tpu.data.samplers import host_shard


def maybe_initialize(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when a cluster is configured.

    Uses explicit args, else the standard env vars
    (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID, or a TPU pod's
    auto-detection when none are set but JAX_COORDINATOR_ADDRESS exists).
    Returns True if distributed mode is active."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    # NOTE: probe initialization WITHOUT jax.process_count() — that call
    # initializes the XLA backend, after which jax.distributed.initialize
    # refuses to run (caught by the 2-process test, tests/test_multihost.py)
    if jax.distributed.is_initialized():
        return True
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", 0))
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("PROCESS_ID", 0)))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or None,
        process_id=process_id,
    )
    return True


def host_info() -> tuple[int, int]:
    """(process_index, process_count) — 0/1 on a single host."""
    return jax.process_index(), jax.process_count()


class HostShardedSampler:
    """Wrap any index sampler so each host sees only its deterministic
    slice (same permutation on every host, host_shard slicing)."""

    def __init__(self, sampler, host_id: int | None = None,
                 host_count: int | None = None):
        self.sampler = sampler
        hid, hcount = host_info()
        self.host_id = host_id if host_id is not None else hid
        self.host_count = host_count if host_count is not None else hcount

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def __iter__(self):
        return iter(host_shard(list(self.sampler), self.host_id,
                               self.host_count))

    def __len__(self) -> int:
        total = len(self.sampler)
        return (total - self.host_id + self.host_count - 1) // self.host_count
