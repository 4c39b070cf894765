"""Spatial (H-axis) sharded DISTS/ADISTS on the virtual 8-device mesh:
parity with the single-chip full-resolution paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_qa_tpu.config import ADISTSConfig, DISTSConfig
from nerf_qa_tpu.core import adists, dists
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.eval.video_scorer import FrameScorer
from nerf_qa_tpu.parallel import mesh as meshlib
from nerf_qa_tpu.parallel.spatial import (
    shard_frames_spatial,
    spatial_adists_forward,
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_spatial_adists_matches_single_chip(setup):
    mesh, vgg, weights, x, y = setup
    # 128x64: stages 0-2 take the windowed path, 3-5 the global-stats
    # fallback — both sharded branches get exercised
    xs = np.ascontiguousarray(x[:, :, :64])
    ys = np.ascontiguousarray(y[:, :, :64])
    cfg = ADISTSConfig()  # fp32 parity mode
    want = np.asarray(adists.forward(vgg, jnp.asarray(xs), jnp.asarray(ys),
                                     cfg, as_loss=False))
    xd, yd = shard_frames_spatial(mesh, (xs, ys))
    got = np.asarray(spatial_adists_forward(vgg, xd, yd, mesh, cfg,
                                            as_loss=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_spatial_adists_map_matches_single_chip(setup):
    mesh, vgg, weights, x, y = setup
    xs = np.ascontiguousarray(x[:, :, :64])
    ys = np.ascontiguousarray(y[:, :, :64])
    cfg = ADISTSConfig()
    want = np.asarray(adists.forward(vgg, jnp.asarray(xs), jnp.asarray(ys),
                                     cfg, as_map=True))
    xd, yd = shard_frames_spatial(mesh, (xs, ys))
    got = np.asarray(spatial_adists_forward(vgg, xd, yd, mesh, cfg,
                                            as_map=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_frame_scorer_spatial_mode(setup):
    mesh, vgg, weights, x, y = setup
    xu = (x * 255).astype(np.uint8)
    yu = (y * 255).astype(np.uint8)
    ref = FrameScorer(vgg, weights, DISTSConfig(), resize_to=None)
    want = ref.score_frames(xu, yu, batch_size=2)
    scorer = FrameScorer(vgg, weights, DISTSConfig(), resize_to=None,
                         mesh=mesh, spatial=True)
    got = scorer.score_frames(xu, yu, batch_size=2)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_frame_scorer_spatial_requires_fullsize():
    with pytest.raises(ValueError):
        FrameScorer(None, None, resize_to=(256, 256), mesh=object(),
                    spatial=True)
