"""NR version-config coverage: auxiliary score-regression generations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_qa_tpu.config import NRModelConfig
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.models.nr.model import NRModel
from nerf_qa_tpu.models.nr.vit import ViTS14

R, S = 64, 56


def _model(cfg):
    return NRModel(init_vgg16_params(seed=0), cfg=cfg, render_size=R,
                   sem_size=S, vit=ViTS14(depth=1))


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    gt = rng.random((2, R, R, 3), dtype=np.float32)
    render = np.clip(gt + 0.05, 0, 1)
    r224 = rng.random((2, S, S, 3), dtype=np.float32)
    return jnp.asarray(gt), jnp.asarray(render), jnp.asarray(r224)


def test_v4_score_residual_head(batch):
    gt, render, r224 = batch
    cfg = NRModelConfig(version=8, transformer_decoder_depth=0,
                        refine_up_depth=1, score_reg_channels=1,
                        score_reg_scale=0.5)
    m = _model(cfg)
    params = m.init(seed=0)
    score = m.forward(params, render, r224)
    assert score.shape == (2,)
    assert np.isfinite(np.asarray(score)).all()


def test_v6_calibration_and_losses(batch):
    gt, render, r224 = batch
    cfg = NRModelConfig(version=8, transformer_decoder_depth=0,
                        refine_up_depth=1, score_reg_channels=4,
                        reg_activation="sigmoid")
    m = _model(cfg)
    params = m.init(seed=0)
    losses = m.losses(
        params, gt, render, r224,
        score_std=jnp.asarray([0.05, 0.06]),
        score_mean=jnp.asarray([0.3, 0.35]),
    )
    assert {"std_loss", "mean_loss"} <= set(losses)
    np.testing.assert_allclose(
        float(losses["combined"]),
        float(cfg.dists_pref2ref_coeff * losses["dists_pref2ref"]
              + (1 - cfg.dists_pref2ref_coeff) * losses["l1"]
              + losses["std_loss"] + losses["mean_loss"]),
        rtol=1e-5,
    )


def test_v8_default_unchanged(batch):
    gt, render, r224 = batch
    cfg = NRModelConfig(transformer_decoder_depth=0, refine_up_depth=1)
    m = _model(cfg)
    params = m.init(seed=0)
    losses = m.losses(params, gt, render, r224)
    assert set(losses) == {"dists_pref2ref", "l1", "combined"}


def test_v3_re_encode_consistency(batch):
    gt, render, r224 = batch
    cfg = NRModelConfig(version=8, transformer_decoder_depth=0,
                        refine_up_depth=1, re_encode_coeff=0.1)
    m = _model(cfg)
    params = m.init(seed=0)
    losses = m.losses(params, gt, render, r224)
    assert "re_encode" in losses
    base = (cfg.dists_pref2ref_coeff * losses["dists_pref2ref"]
            + (1 - cfg.dists_pref2ref_coeff) * losses["l1"])
    np.testing.assert_allclose(
        float(losses["combined"]),
        float(base + 0.1 * losses["re_encode"]), rtol=1e-5,
    )
