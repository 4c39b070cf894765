"""One host of the 2-process CPU cluster spawned by tests/test_multihost.py.

Exercises the ONLY distributed entry point unit tests can't reach in a
single process (parallel/distributed.py:23-51): a real
``jax.distributed.initialize`` rendezvous, a global mesh spanning both
processes' devices, per-host input sharding via HostShardedSampler, and
one data-parallel FR train step whose gradient all-reduce crosses the
process boundary. Prints machine-checkable lines:

  SHARD <host_id> <indices>       the host's sampler slice
  LOSS <value>                    the (replicated) step loss
  PARAMS <leaf>=<float64 repr>    per-leaf param checksums after the step

The parent asserts both processes print IDENTICAL LOSS/PARAMS lines —
data-parallel training must leave every host with the same parameters.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_qa_tpu.parallel.distributed import (  # noqa: E402
    HostShardedSampler,
    host_info,
    maybe_initialize,
)


def main() -> int:
    assert maybe_initialize(), "cluster env vars missing"
    import jax

    hid, hcount = host_info()
    assert hcount == 2, hcount
    assert jax.device_count() == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerf_qa_tpu.config import DISTSConfig, FRModelConfig, TrainConfig
    from nerf_qa_tpu.core.dists import load_pretrained_weights
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.data.samplers import host_shard
    from nerf_qa_tpu.parallel import mesh as meshlib
    from nerf_qa_tpu.train.fr_train import FRTrainer

    mesh = meshlib.create_mesh(jax.devices())  # global 4-device data mesh

    # deterministic global dataset, identical on both hosts
    rng = np.random.default_rng(0)
    n_global = 4  # one frame per device
    dist = rng.random((n_global, 32, 32, 3)).astype(np.float32)
    ref = np.clip(dist + 0.05, 0, 1).astype(np.float32)
    targets = rng.uniform(1, 5, n_global).astype(np.float32)

    sampler = HostShardedSampler(range(n_global))
    idx = np.asarray(list(sampler), np.int64)
    print(f"SHARD {hid} {idx.tolist()}", flush=True)

    # global batch row order = host0's shard rows then host1's (the
    # contiguous row->device layout of P('data') over the global mesh)
    global_order = np.concatenate([
        host_shard(range(n_global), h, hcount) for h in range(hcount)
    ]).astype(np.int64)

    sh = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    gdist = jax.make_array_from_process_local_data(sh, dist[idx])
    gref = jax.make_array_from_process_local_data(sh, ref[idx])

    dcfg = DISTSConfig(compute_dtype="float32")
    trainer = FRTrainer(
        init_vgg16_params(seed=0),
        model_cfg=FRModelConfig(regression_type="linear", dists=dcfg),
        train_cfg=TrainConfig(lr=1e-3, schedule="constant",
                              batch_size=n_global),
        steps_per_epoch=1,
        mesh=mesh,
        dists_weights=load_pretrained_weights(dcfg),
    )
    fx = rng.uniform(0.1, 0.6, 16)
    fy = 5.0 - 4.0 * fx
    params, opt_state = trainer.init(fx, fy)
    params, opt_state, loss, _ = trainer.train_step(
        params, opt_state, gdist, gref, targets[global_order]
    )
    loss = float(jax.device_get(jax.tree_util.tree_map(
        lambda x: x, loss)))
    assert np.isfinite(loss), loss
    print(f"LOSS {loss!r}", flush=True)

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        val = np.asarray(jax.device_get(leaf), np.float64)
        print(f"PARAMS {jax.tree_util.keystr(path)}="
              f"{float(val.sum())!r}/{float(np.abs(val).sum())!r}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
