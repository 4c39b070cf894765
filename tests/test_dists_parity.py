"""DISTS parity vs the torch oracle: identical weights, <1e-4 score gap.

BASELINE.json north star requires matching PyTorch DISTS outputs to <1e-4;
these tests establish that on the computation itself with shared random
VGG weights and the bundled pretrained α/β.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.core.vgg import init_vgg16_params, vgg16_pyramid
from nerf_qa_tpu.ops.l2pool import l2pool
from tests.oracles.torch_dists import (
    dists_full_torch,
    l2pool_torch,
    vgg_pyramid_torch,
)


def _np_params(params):
    return jax.tree_util.tree_map(np.asarray, params)


@pytest.fixture(scope="module")
def vgg_params():
    return init_vgg16_params(seed=0)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(42)
    x = rng.random((2, 64, 96, 3), dtype=np.float32)
    y = np.clip(x + rng.normal(0, 0.08, x.shape).astype(np.float32), 0, 1)
    return x, y


def test_l2pool_matches_torch(images):
    x, _ = images
    ours = np.asarray(l2pool(jnp.asarray(x)))
    ref = l2pool_torch(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_l2pool_odd_sizes():
    x = np.random.default_rng(0).random((1, 63, 97, 4), dtype=np.float32)
    ours = np.asarray(l2pool(jnp.asarray(x)))
    ref = l2pool_torch(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert ours.shape == tuple(ref.permute(0, 2, 3, 1).shape)
    np.testing.assert_allclose(
        ours, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6
    )


def test_l2pool_band_matches_depthwise():
    """The banded-MXU formulation (dispatched for maps > ~100k pixels)
    must match the depthwise-conv formulation and the torch oracle,
    including odd sizes where stride-2 windows straddle the zero pad."""
    from nerf_qa_tpu.ops.l2pool import _l2pool_band

    for shape in [(1, 63, 97, 4), (2, 40, 48, 8)]:
        x = np.random.default_rng(1).random(shape, dtype=np.float32)
        dw = np.asarray(l2pool(jnp.asarray(x)))
        band = np.asarray(
            _l2pool_band(jnp.asarray(x), 5, 2, 1,
                         jax.lax.Precision.HIGHEST, jnp.float32)
        )
        np.testing.assert_allclose(band, dw, rtol=1e-5, atol=1e-6)
        ref = l2pool_torch(torch.from_numpy(x).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            band, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6
        )


def test_pyramid_matches_torch(vgg_params, images):
    x, _ = images
    feats = vgg16_pyramid(vgg_params, jnp.asarray(x))
    ref_feats = vgg_pyramid_torch(
        _np_params(vgg_params), torch.from_numpy(x).permute(0, 3, 1, 2)
    )
    assert len(feats) == 6
    for k, (f, rf) in enumerate(zip(feats, ref_feats)):
        rf = rf.permute(0, 2, 3, 1).numpy()
        assert f.shape == rf.shape, f"stage {k}"
        np.testing.assert_allclose(
            np.asarray(f), rf, rtol=2e-4, atol=2e-5, err_msg=f"stage {k}"
        )


def test_dists_score_matches_torch(vgg_params, images):
    x, y = images
    w = dists.load_pretrained_weights()
    score = dists.forward(vgg_params, w, jnp.asarray(x), jnp.asarray(y))
    ref = dists_full_torch(
        _np_params(vgg_params),
        np.asarray(w.alpha),
        np.asarray(w.beta),
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(y).permute(0, 3, 1, 2),
    ).numpy()
    assert score.shape == (2,)
    np.testing.assert_allclose(np.asarray(score), ref, atol=1e-4)


def test_identical_images_low_distance(vgg_params, images):
    x, _ = images
    w = dists.load_pretrained_weights()
    score = dists.forward(vgg_params, w, jnp.asarray(x), jnp.asarray(x))
    # S1 = S2 = 1 everywhere -> score = 1 - sum(normalized weights) = 0
    np.testing.assert_allclose(np.asarray(score), 0.0, atol=1e-5)


def test_batch_average(vgg_params, images):
    x, y = images
    w = dists.load_pretrained_weights()
    per = dists.forward(vgg_params, w, jnp.asarray(x), jnp.asarray(y))
    avg = dists.forward(
        vgg_params, w, jnp.asarray(x), jnp.asarray(y), batch_average=True
    )
    np.testing.assert_allclose(np.asarray(avg), np.asarray(per).mean(), rtol=1e-6)


def test_project_weights_matches_reference_semantics():
    w = dists.DISTSWeights(
        jnp.asarray(np.linspace(-0.1, 0.1, 1475, dtype=np.float32)),
        jnp.asarray(np.linspace(0.1, -0.1, 1475, dtype=np.float32)),
    )
    pw = dists.project_weights(w, DISTSConfig())
    a, b = np.asarray(pw.alpha), np.asarray(pw.beta)
    assert (a[3:] >= 0).all() and (b[3:] >= 0).all()
    # RGB channels floored at 0.02 before renormalization
    raw_a = np.maximum(np.asarray(w.alpha), np.concatenate([[0.02] * 3, [0.0] * 1472]))
    raw_b = np.maximum(np.asarray(w.beta), np.concatenate([[0.02] * 3, [0.0] * 1472]))
    s = raw_a.sum() + raw_b.sum()
    np.testing.assert_allclose(a, raw_a / s, rtol=1e-6)
    np.testing.assert_allclose(b, raw_b / s, rtol=1e-6)
    np.testing.assert_allclose(a.sum() + b.sum(), 1.0, rtol=1e-5)


def test_softmax_variant_consistency():
    """softmax logits of pretrained weights reproduce ~the same score."""
    cfg_main = DISTSConfig(variant="main")
    cfg_soft = DISTSConfig(variant="softmax")
    w_main = dists.load_pretrained_weights(cfg_main)
    w_soft = dists.load_pretrained_weights(cfg_soft)
    a_m, b_m = dists.normalized_alpha_beta(w_main, cfg_main)
    a_s, b_s = dists.normalized_alpha_beta(w_soft, cfg_soft)
    # softmax(log(w + eps)) == w / sum(w) up to the eps clamp
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_m), atol=2e-4)
    np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_m), atol=2e-4)


def test_grad_flows_to_weights(vgg_params, images):
    x, y = images
    w = dists.load_pretrained_weights()

    def loss(w):
        return dists.forward(
            vgg_params, w, jnp.asarray(x), jnp.asarray(y), batch_average=True
        )

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g.alpha)).all()
    assert np.abs(np.asarray(g.alpha)).max() > 0
