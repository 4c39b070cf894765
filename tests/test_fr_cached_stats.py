"""FR stats-cache training path: cached (5,1475) pair moments must give
the SAME losses and parameter updates as the image path (the frozen-VGG
half of DISTS is hoisted, not approximated — fr.forward_from_stats)."""
import numpy as np
import jax.numpy as jnp
import pytest

from nerf_qa_tpu.config import DISTSConfig, FRModelConfig, TrainConfig
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.train.fr_train import FRTrainer


@pytest.fixture(scope="module")
def trainer():
    cfg = FRModelConfig(
        regression_type="logistic",
        dists=DISTSConfig(compute_dtype="float32"),
    )
    return FRTrainer(
        init_vgg16_params(seed=0), cfg,
        TrainConfig(lr=1e-3, schedule="constant", batch_size=4,
                    entropy_loss_coeff=0.01, project_weights=True),
        steps_per_epoch=2,
    )


def _batch(n=4, hw=(32, 32)):
    rng = np.random.default_rng(0)
    ref = rng.random((n, *hw, 3), dtype=np.float32)
    dist = np.clip(ref + rng.normal(0, 0.1, ref.shape), 0, 1).astype(np.float32)
    targets = rng.uniform(1, 5, n).astype(np.float32)
    return dist, ref, targets


def test_cached_step_matches_image_step(trainer):
    dist, ref, targets = _batch()
    params, opt_state = trainer.init(
        np.linspace(0.1, 0.5, 8), np.linspace(4.5, 1.0, 8)
    )
    stats = np.asarray(
        trainer._pair_stats_step(jnp.asarray(dist), jnp.asarray(ref))
    ).transpose(1, 0, 2)  # cache layout (N, 5, 1475)

    # both jitted steps donate (params, opt_state); deep-copy so the
    # second call never touches donated buffers on the hardware tier
    import jax

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    p_img, o_img, loss_img, aux_img = trainer.train_step(
        copy(params), copy(opt_state), dist, ref, targets
    )
    p_c, o_c, loss_c, aux_c = trainer.train_step_cached(
        copy(params), copy(opt_state), stats, targets
    )
    assert np.allclose(float(loss_img), float(loss_c), atol=1e-5)
    assert np.allclose(np.asarray(aux_img[0]), np.asarray(aux_c[0]), atol=1e-5)
    for a, b in zip(
        [np.asarray(x) for x in (p_img["dists"].alpha, p_img["dists"].beta)],
        [np.asarray(x) for x in (p_c["dists"].alpha, p_c["dists"].beta)],
    ):
        np.testing.assert_allclose(a, b, atol=1e-6)
    for k in p_img["head"]:
        np.testing.assert_allclose(np.asarray(p_img["head"][k]),
                                   np.asarray(p_c["head"][k]), atol=1e-6)


def test_build_stats_cache_and_epoch(trainer):
    dist, ref, targets = _batch(n=6)
    vids = np.array([0, 0, 1, 1, 2, 2])
    batches = [
        (dist[:3], ref[:3], targets[:3], vids[:3]),
        (dist[3:], ref[3:], targets[3:], vids[3:]),
    ]
    cache = trainer.build_stats_cache(iter(batches))
    assert cache["stats"].shape == (6, 5, 1475)
    np.testing.assert_array_equal(cache["video_ids"], vids)

    params, opt_state = trainer.init(
        np.linspace(0.1, 0.5, 8), np.linspace(4.5, 1.0, 8)
    )
    order = np.array([4, 2, 0, 5, 1, 3])
    params, opt_state, loss = trainer.train_epoch_cached(
        params, opt_state, cache, order, batch_size=3
    )
    assert np.isfinite(loss)
