"""Spatial (H-axis) sharded DISTS on the virtual 8-device mesh: parity
with the single-chip full-resolution path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.parallel import mesh as meshlib
from nerf_qa_tpu.parallel.spatial import (
    shard_frames_spatial,
    spatial_dists_forward,
)


@pytest.fixture(scope="module")
def setup():
    devices = jax.devices()[:8]
    if len(devices) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = meshlib.create_mesh(devices, model_parallel=4)  # data 2 x model 4
    vgg = init_vgg16_params(seed=0)
    weights = dists.load_pretrained_weights()
    rng = np.random.default_rng(0)
    x = rng.random((2, 256, 128, 3), dtype=np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    return mesh, vgg, weights, x, y


def test_spatial_sharded_matches_single_chip(setup):
    mesh, vgg, weights, x, y = setup
    cfg = DISTSConfig()  # fp32 parity mode
    want = np.asarray(dists.forward(vgg, weights, jnp.asarray(x),
                                    jnp.asarray(y), cfg))
    xs, ys = shard_frames_spatial(mesh, (x, y))
    got = np.asarray(spatial_dists_forward(vgg, weights, xs, ys, mesh, cfg))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_spatial_sharded_rejects_unaligned(setup):
    mesh, vgg, weights, x, y = setup
    with pytest.raises(ValueError):
        spatial_dists_forward(vgg, weights, jnp.zeros((1, 250, 128, 3)),
                              jnp.zeros((1, 250, 128, 3)), mesh)
