"""FR model heads, trainer loop, correlations, metric logger."""
import numpy as np
import pytest

from nerf_qa_tpu.config import DISTSConfig, FRModelConfig, TrainConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.eval.correlations import (
    combined_score,
    compute_correlations,
    scene_grouped_correlations,
)
from nerf_qa_tpu.logging.metrics import MetricCollectionLogger
from nerf_qa_tpu.models import fr
from nerf_qa_tpu.train.fr_train import FRTrainer, group_kfold_splits


@pytest.fixture(scope="module")
def vgg_params():
    return init_vgg16_params(seed=0)


@pytest.fixture(scope="module")
def fake_train_df():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 0.6, 40)
    y = 5.0 - 6.0 * x + rng.normal(0, 0.1, 40)  # MOS ~ anti-correlated
    return x, y


def test_linear_head_init_matches_lstsq(fake_train_df):
    x, y = fake_train_df
    head = fr.init_head_params(x, y, FRModelConfig(regression_type="linear"))
    pred = np.asarray(head["weight"])[0] * x + np.asarray(head["bias"])[0]
    # initialization should already be a good linear fit
    assert np.corrcoef(pred, y)[0, 1] > 0.95


def test_sqrt_head(fake_train_df):
    x, y = fake_train_df
    cfg = FRModelConfig(regression_type="sqrt")
    head = fr.init_head_params(x, y, cfg)
    import jax.numpy as jnp

    out = fr.apply_head(head, jnp.asarray(x, jnp.float32), cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_logistic_head_init_and_apply(fake_train_df):
    x, y = fake_train_df
    cfg = FRModelConfig(regression_type="logistic")
    head = fr.init_head_params(x, y, cfg)
    assert set(head) == {"b1", "b2", "b3", "b4"}
    import jax.numpy as jnp

    out = np.asarray(fr.apply_head(head, jnp.asarray(x, jnp.float32), cfg))
    # logistic fit should track the data closely
    assert np.corrcoef(out, y)[0, 1] > 0.9


def test_fr_forward_shapes(vgg_params, fake_train_df):
    x, y = fake_train_df
    params = fr.init_params(x, y, FRModelConfig())
    rng = np.random.default_rng(1)
    d = rng.random((2, 32, 32, 3), dtype=np.float32)
    r = rng.random((2, 32, 32, 3), dtype=np.float32)
    mos, ds = fr.forward(params, vgg_params, d, r)
    assert mos.shape == (2,) and ds.shape == (2,)


def test_entropy_loss_minimized_at_pretrained(vgg_params, fake_train_df):
    x, y = fake_train_df
    cfg = FRModelConfig()
    params = fr.init_params(x, y, cfg)
    orig = dists.load_pretrained_weights(cfg.dists)
    at_orig = float(fr.entropy_loss(params, orig, cfg))
    perturbed = dict(
        params,
        dists=dists.DISTSWeights(params["dists"].alpha * 3.0, params["dists"].beta),
    )
    assert float(fr.entropy_loss(perturbed, orig, cfg)) > at_orig


def test_fr_trainer_reduces_loss(vgg_params, fake_train_df):
    x, y = fake_train_df
    model_cfg = FRModelConfig()
    train_cfg = TrainConfig(lr=3e-2, epochs=2, project_weights=True)
    trainer = FRTrainer(vgg_params, model_cfg, train_cfg, steps_per_epoch=4)
    params, opt_state = trainer.init(x, y)

    rng = np.random.default_rng(2)
    d = rng.random((8, 32, 32, 3), dtype=np.float32)
    r = np.clip(d + rng.normal(0, 0.1, d.shape).astype(np.float32), 0, 1)
    targets = rng.uniform(1, 5, 8).astype(np.float32)

    losses = []
    for _ in range(8):
        params, opt_state, loss, _ = trainer.train_step(
            params, opt_state, d, r, targets
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # projection keeps weights a normalized distribution
    w = params["dists"]
    total = float(np.asarray(w.alpha).sum() + np.asarray(w.beta).sum())
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)


def test_score_dataloader_video_pooling(vgg_params, fake_train_df):
    x, y = fake_train_df
    trainer = FRTrainer(vgg_params, FRModelConfig(), TrainConfig())
    params, _ = trainer.init(x, y)
    rng = np.random.default_rng(3)

    def batches():
        for vid in [0, 0, 1]:
            d = rng.random((2, 32, 32, 3), dtype=np.float32)
            yield d, d.copy(), None, np.full(2, vid)

    result = trainer.score_dataloader(params, batches())
    assert set(result["pred_score"]) == {0, 1}
    # identical pairs -> dists score 0 for every video
    np.testing.assert_allclose(
        list(result["dists_score"].values()), 0.0, atol=1e-5
    )


@pytest.mark.slow
def test_scene_type_head_identity_then_learns(vgg_params, fake_train_df):
    """Scene-type calibration (run_test2.py:218 hook): identity at init,
    and per-type affines absorb a type-dependent target offset that the
    shared head cannot explain."""
    x, y = fake_train_df
    trainer = FRTrainer(vgg_params, FRModelConfig(),
                        TrainConfig(lr=5e-2, schedule="constant"),
                        n_scene_types=2)
    params, opt_state = trainer.init(x, y)

    rng = np.random.default_rng(5)
    d = rng.random((8, 32, 32, 3), dtype=np.float32)
    r = np.clip(d + rng.normal(0, 0.1, d.shape).astype(np.float32), 0, 1)
    st = np.tile(np.array([0, 1], np.int32), 4)

    pred_plain, _ = trainer.evaluate(params, d, r)
    pred_typed, _ = trainer.evaluate(params, d, r, scene_types=st)
    np.testing.assert_allclose(np.asarray(pred_plain),
                               np.asarray(pred_typed), atol=1e-6)

    targets = (3.0 + 2.0 * st).astype(np.float32)
    for _ in range(40):
        params, opt_state, loss, _ = trainer.train_step(
            params, opt_state, d, r, targets, scene_types=st
        )
    p0, _ = trainer.evaluate(params, d, r,
                             scene_types=np.zeros(8, np.int32))
    p1, _ = trainer.evaluate(params, d, r,
                             scene_types=np.ones(8, np.int32))
    # identical inputs: only the calibration separates the types
    assert float(np.mean(np.asarray(p1) - np.asarray(p0))) > 1.0


def test_group_kfold_no_scene_leakage():
    groups = np.repeat(np.arange(8), 5)
    for train_idx, test_idx in group_kfold_splits(groups, 4):
        assert not set(groups[train_idx]) & set(groups[test_idx])
        assert len(train_idx) + len(test_idx) == len(groups)


def test_correlations_basic():
    pred = np.array([1.0, 2.0, 3.0, 4.0])
    c = compute_correlations(pred, pred * 2 + 1)
    assert c["plcc"] == pytest.approx(1.0)
    assert c["srcc"] == pytest.approx(1.0)
    assert c["ktcc"] == pytest.approx(1.0)


def _fake_video_report():
    rng = np.random.default_rng(4)
    scenes = ["train", "m60", "lego", "ship"]
    pred, target, scene = {}, {}, {}
    vid = 0
    for s in scenes:
        for _ in range(4):
            t = rng.uniform(1, 5)
            pred[vid] = -t + rng.normal(0, 0.05)
            target[vid] = t
            scene[vid] = s
            vid += 1
    return pred, target, scene


def test_scene_grouped_correlations_sections():
    pred, target, scene = _fake_video_report()
    rep = scene_grouped_correlations(pred, target, scene)
    assert set(rep["per_scene"]) == {"train", "m60", "lego", "ship"}
    for sec in ["overall", "real", "synthetic", "scene_min", "scene_mean",
                "real_scene_mean", "synth_scene_mean"]:
        assert sec in rep, sec
    assert rep["overall"]["plcc"] < -0.95  # anti-correlated construction
    assert rep["scene_mean"]["plcc"] > 0.95  # absolute per-scene corr


def test_combined_score_rewards_perfect():
    pred, target, scene = _fake_video_report()
    rep = scene_grouped_correlations(pred, target, scene)
    good = combined_score(rep)
    worse = {k: (dict(v, plcc=0.0, srcc=0.0) if isinstance(v, dict) and "plcc" in v else v)
             for k, v in rep.items() if k != "per_scene"}
    assert good > combined_score(worse)


def test_metric_logger_aggregation():
    captured = {}

    def sink(logs, step):
        captured.update(logs)

    logger = MetricCollectionLogger("Test Metrics Dict", log_fn=sink)
    # mirrors the reference's logger self-test data (logger.py:326-333)
    data = [
        ({"pred_score": [4.5, 4.7, 4.6], "mse": [3.9, 3.92, 3.91],
          "mos": [0.6, 0.67, 0.6]}, [1, 1, 1], [101, 101, 101]),
        ({"pred_score": [3.5, 3.6, 3.7], "mse": [0.85, 0.87, 0.86],
          "mos": [3.6, 3.6, 3.6]}, [2, 2, 2], [101, 101, 101]),
        ({"pred_score": [4.8, 4.9, 5.0], "mse": [0.93, 0.95, 0.94],
          "mos": [4.79, 4.9, 4.9]}, [3, 3, 3], [102, 102, 102]),
        ({"pred_score": [3.8, 3.9, 4.0], "mse": [0.88, 0.89, 0.90],
          "mos": [3.9, 3.9, 3.9]}, [4, 4, 4], [102, 102, 102]),
        ({"pred_score": 5, "mse": 0.88, "mos": 3.9}, 4, 102),
    ]
    for metrics, vids, sids in data:
        logger.add_entries(metrics, video_ids=vids, scene_ids=sids)
    df = logger.video_metrics_df()
    assert set(df.index) == {1, 2, 3, 4}
    np.testing.assert_allclose(df.loc[1, "pred_score"], np.mean([4.5, 4.7, 4.6]))
    assert "rmse" in df.columns
    logs = logger.log_summary(step=1)
    assert logs["Test Metrics Dict/pred_score"] == pytest.approx(
        np.mean([np.mean([4.5, 4.7, 4.6]), np.mean([3.5, 3.6, 3.7]),
                 np.mean([4.8, 4.9, 5.0]),
                 np.mean([3.8, 3.9, 4.0, 5.0])])
    )
    assert "Test Metrics Dict/correlations/mos/plcc" in logs
    # state reset after summary
    assert logger.metrics == {}
