"""NR model family: encoder shapes, decoder cascade, losses, training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_qa_tpu.config import DISTSConfig, NRModelConfig, TrainConfig
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.models.nr.model import NRModel
from nerf_qa_tpu.models.nr.vit import ViTS14
from nerf_qa_tpu.train.nr_train import NRTrainer, scene_holdout_split

# Small-but-valid input pair: DISTS pyramid (H/16) and ViT grid (H_sem/14)
# must agree: 64/16 == 56/14 == 4.
R256, R224 = 64, 56


@pytest.fixture(scope="module")
def model():
    vgg = init_vgg16_params(seed=0)
    # tiny ViT + shallow decoder to keep CPU tests fast
    return NRModel(
        vgg,
        cfg=NRModelConfig(transformer_decoder_depth=1, refine_up_depth=2,
                          dropout_rate=0.1),
        render_size=R256, sem_size=R224, vit=ViTS14(depth=2),
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    gt = rng.random((2, R256, R256, 3), dtype=np.float32)
    render = np.clip(gt + rng.normal(0, 0.08, gt.shape).astype(np.float32), 0, 1)
    r224 = rng.random((2, R224, R224, 3), dtype=np.float32)
    return gt, render, r224


def test_vit_token_shapes():
    vit = ViTS14(depth=1)
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((2, R224, R224, 3)))
    out = vit.apply(params, jnp.zeros((2, R224, R224, 3)))
    assert out["x_norm_patchtokens"].shape == (2, 16, 384)
    assert out["x_norm_clstoken"].shape == (2, 384)
    assert out["x_norm_regtokens"].shape == (2, 4, 384)


def test_encoder_pyramid_shapes(model, batch):
    _, render, r224 = batch
    feats = model.encode(jnp.asarray(render), jnp.asarray(r224))
    assert len(feats.dists_feats) == 6
    assert feats.sem_feats.shape == (2, 4, 4, 384)
    assert len(feats.sem_pyramid) == 6
    # semantic pyramid spatial sizes match reversed DISTS pyramid
    rev = list(reversed([f.shape[1] for f in feats.dists_feats]))
    sem = [f.shape[1] for f in feats.sem_pyramid]
    assert sem == rev


@pytest.mark.slow  # tier budget: decoder cascade also covered by forward/losses fast tests + the v1-v8 sweep
def test_decoder_predicts_full_pyramid(model, batch):
    _, render, r224 = batch
    params, state = model.init(seed=0)
    feats = model.encode(jnp.asarray(render), jnp.asarray(r224))
    predicted = model.pred_gt_dists_feats(params, feats, state=state)
    assert len(predicted) == 6
    for p, f in zip(predicted, feats.dists_feats):
        assert p.shape == f.shape, (p.shape, f.shape)


def test_nr_forward_score(model, batch):
    _, render, r224 = batch
    params, state = model.init(seed=0)
    score = model.forward(params, jnp.asarray(render), jnp.asarray(r224),
                          state=state)
    assert score.shape == (2,)
    assert np.isfinite(np.asarray(score)).all()


def test_nr_losses_structure(model, batch):
    gt, render, r224 = batch
    params, state = model.init(seed=0)
    losses, _ = model.losses(params, jnp.asarray(gt), jnp.asarray(render),
                             jnp.asarray(r224), state=state)
    assert set(losses) == {"dists_pref2ref", "l1", "combined"}
    c = model.cfg.dists_pref2ref_coeff
    np.testing.assert_allclose(
        float(losses["combined"]),
        c * float(losses["dists_pref2ref"]) + (1 - c) * float(losses["l1"]),
        rtol=1e-5,
    )


@pytest.mark.slow
def test_nr_training_reduces_loss(model, batch):
    gt, render, r224 = batch
    trainer = NRTrainer(model, TrainConfig(lr=3e-4, schedule="constant"),
                        steps_per_epoch=4)
    params, state, opt_state, rng = trainer.init(seed=0)
    losses0 = None
    for i in range(4):
        params, state, opt_state, losses, rng = trainer.train_step(
            params, state, opt_state, gt, render, r224, rng
        )
        if i == 0:
            losses0 = {k: float(v) for k, v in losses.items()}
    assert float(losses["combined"]) < losses0["combined"]


@pytest.mark.slow  # tier budget: video pooling covered by test_nr_benchmark fast tests
def test_nr_video_scoring(model, batch):
    _, render, r224 = batch
    trainer = NRTrainer(model, TrainConfig(), steps_per_epoch=1)
    params, state, _, _ = trainer.init(seed=0)
    frames_256 = np.repeat(render, 3, axis=0)[:5]
    frames_224 = np.repeat(r224, 3, axis=0)[:5]
    v = trainer.score_video(params, state, frames_256, frames_224,
                            batch_size=2)
    assert np.isfinite(v)


def test_scene_holdout_split():
    scenes = np.array(["a", "a", "b", "c", "c", "d"])
    methods = np.array(["x", "bad", "x", "x", "bad", "x"])
    train, val = scene_holdout_split(
        scenes, ["b", "d"], methods, blacklist_methods=["bad"]
    )
    assert list(val) == [False, False, True, False, False, True]
    assert list(train) == [True, False, False, True, False, False]


@pytest.mark.slow  # tier budget: every generation trains in the slow v1-v8 sweep
def test_version_config_older_generation():
    """v1-v6 config point: init returns a batch_stats state that eval
    consumes (the round-1 ScopeCollectionNotFound repro, fixed)."""
    cfg = NRModelConfig(version=6, transformer_decoder_depth=0,
                        dropout_rate=0.0)
    vgg = init_vgg16_params(seed=0)
    m = NRModel(vgg, cfg=cfg, render_size=R256, sem_size=R224,
                vit=ViTS14(depth=1))
    params, state = m.init(seed=0)
    assert "batch_stats" in state
    rng = np.random.default_rng(1)
    r256 = rng.random((1, R256, R256, 3), dtype=np.float32)
    r224 = rng.random((1, R224, R224, 3), dtype=np.float32)
    score = m.forward(params, jnp.asarray(r256), jnp.asarray(r224),
                      state=state)
    assert np.isfinite(np.asarray(score)).all()
