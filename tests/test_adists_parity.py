"""ADISTS parity vs the torch oracle with identical injected weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from nerf_qa_tpu.config import ADISTSConfig
from nerf_qa_tpu.core import adists
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.ops.windowed import window_mean
from tests.oracles.torch_adists import adists_torch, compute_prob_torch, wconv
from tests.oracles.torch_dists import vgg_pyramid_torch


def _np_params(params):
    return jax.tree_util.tree_map(np.asarray, params)


@pytest.fixture(scope="module")
def vgg_params():
    return init_vgg16_params(seed=0)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(11)
    # 96x96: stages 0-2 fit the 21x21 window; stages 3-5 hit the
    # global-stats fallback — both paths exercised.
    x = rng.random((2, 96, 96, 3), dtype=np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    return x, y


def test_window_mean_matches_torch():
    rng = np.random.default_rng(12)
    x = rng.random((1, 40, 48, 8), dtype=np.float32)
    ours = np.asarray(window_mean(jnp.asarray(x), 21))
    ref = wconv(torch.from_numpy(x).permute(0, 3, 1, 2), 21)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_compute_prob_matches_torch(vgg_params, images):
    x, _ = images
    feats = adists.forward_once(vgg_params, jnp.asarray(x))
    ps = adists.compute_prob(feats)
    t_feats = vgg_pyramid_torch(
        _np_params(vgg_params), torch.from_numpy(x).permute(0, 3, 1, 2)
    )
    t_ps = compute_prob_torch(t_feats)
    assert len(ps) == len(t_ps) == 6
    for k, (a, b) in enumerate(zip(ps, t_ps)):
        b = b.permute(0, 2, 3, 1).numpy()
        assert a.shape == b.shape, f"stage {k}: {a.shape} vs {b.shape}"
        np.testing.assert_allclose(
            np.asarray(a), b, atol=5e-4, err_msg=f"stage {k}"
        )


def test_adists_score_matches_torch(vgg_params, images):
    x, y = images
    score = adists.forward(
        vgg_params, jnp.asarray(x), jnp.asarray(y), as_loss=False
    )
    ref = adists_torch(
        _np_params(vgg_params),
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(y).permute(0, 3, 1, 2),
    ).numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(score), ref, atol=1e-4)


def test_adists_as_loss_is_mean(vgg_params, images):
    x, y = images
    per = adists.forward(vgg_params, jnp.asarray(x), jnp.asarray(y), as_loss=False)
    loss = adists.forward(vgg_params, jnp.asarray(x), jnp.asarray(y), as_loss=True)
    np.testing.assert_allclose(float(loss), float(np.asarray(per).mean()), rtol=1e-6)


def test_adists_as_map_shape(vgg_params, images):
    x, y = images
    m = adists.forward(
        vgg_params, jnp.asarray(x), jnp.asarray(y), as_map=True
    )
    assert m.shape == (2, 96, 96)
    assert np.isfinite(np.asarray(m)).all()


def test_adists_identical_images_high_similarity(vgg_params, images):
    x, _ = images
    score = adists.forward(vgg_params, jnp.asarray(x), jnp.asarray(x), as_loss=False)
    # D -> ~1 per image when x == y (T = S = 1 everywhere)
    np.testing.assert_allclose(np.asarray(score), 0.0, atol=5e-3)


def test_serving_bf16_close_to_fp32(vgg_params, images):
    """The bf16 serving path (bf16 pyramid + DEFAULT-precision windowed
    moments) must stay close to the fp32 parity path: scores are
    channel/stage aggregates, so bf16 operand rounding averages out well
    below perceptual significance (measured ~3e-4 on the TPU)."""
    x, y = images
    f32 = adists.forward(
        vgg_params, jnp.asarray(x), jnp.asarray(y),
        ADISTSConfig(compute_dtype="float32"), as_loss=False,
    )
    b16 = adists.forward(
        vgg_params, jnp.asarray(x), jnp.asarray(y),
        ADISTSConfig(compute_dtype="bfloat16"), as_loss=False,
    )
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32), atol=5e-3)


@pytest.mark.slow  # tier budget: blocked path also exercised by spatial-sharding fast tests
def test_blocked_fullres_path_matches_unblocked():
    """The channel-blocked full-resolution path (lax.scan over channel
    blocks) must produce the same scores as the unblocked path."""
    import jax.numpy as jnp

    from nerf_qa_tpu.config import ADISTSConfig
    from nerf_qa_tpu.core import adists
    from nerf_qa_tpu.core.vgg import init_vgg16_params

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    vgg = init_vgg16_params(seed=0)
    base = adists.forward(vgg, x, y, ADISTSConfig(), as_loss=False)
    blocked = adists.forward(
        vgg, x, y,
        ADISTSConfig(block_pixels_threshold=0, channel_block=16),
        as_loss=False,
    )
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(base),
                               rtol=1e-5, atol=1e-6)
    # as_map parity too
    m0 = adists.forward(vgg, x, y, ADISTSConfig(), as_map=True)
    m1 = adists.forward(
        vgg, x, y, ADISTSConfig(block_pixels_threshold=0), as_map=True
    )
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-4, atol=1e-5)
