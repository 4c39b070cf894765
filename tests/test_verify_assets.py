"""tools/verify_assets: the one-command real-checkpoint verification
chain (VERDICT r3 item 5). Exercised against fabricated checkpoints in
every reference format the converters accept; the real golden-0.3347 run
stays gated on $NERF_QA_VGG_CKPT (zero-egress environment)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerf_qa_tpu.config import FRModelConfig  # noqa: E402
from nerf_qa_tpu.core import dists  # noqa: E402
from nerf_qa_tpu.core.vgg import VGG16_STAGES, init_vgg16_params  # noqa: E402
from nerf_qa_tpu.models import fr  # noqa: E402
from nerf_qa_tpu.tools import verify_assets  # noqa: E402


def _fake_vgg_pth(path):
    rng = np.random.default_rng(0)
    state = {}
    idxs = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
    for stage, conv_idxs in zip(VGG16_STAGES, idxs):
        for (cin, cout), i in zip(stage, conv_idxs):
            state[f"features.{i}.weight"] = torch.from_numpy(
                rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32))
            state[f"features.{i}.bias"] = torch.from_numpy(
                rng.normal(0, 0.01, (cout,)).astype(np.float32))
    torch.save(state, path)


def _fake_weights_pt(path):
    w = dists.load_pretrained_weights()
    torch.save({
        "alpha": torch.from_numpy(
            np.asarray(w.alpha).reshape(1, 1475, 1, 1)),
        "beta": torch.from_numpy(
            np.asarray(w.beta).reshape(1, 1475, 1, 1)),
    }, path)


def _fake_fr_model_pth(path):
    from nerf_qa_tpu.compat.export_torch import (
        export_fr_state_dict,
        save_state_dict,
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(0.001, 0.2, 24)  # random-VGG score scale
    y = 5.0 - 20.0 * x + rng.normal(0, 0.05, 24)
    cfg = FRModelConfig(regression_type="logistic")
    params = fr.init_params(
        x, y, cfg, dists_weights=dists.load_pretrained_weights(cfg.dists))
    save_state_dict(
        export_fr_state_dict(params, vgg_params=init_vgg16_params(seed=0)),
        str(path))


@pytest.fixture(scope="module")
def assets_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    _fake_vgg_pth(d / "vgg16-397923af.pth")
    _fake_weights_pt(d / "weights.pt")
    _fake_fr_model_pth(d / "model.pth")
    return d


def test_verify_assets_discovers_and_passes(assets_dir, capsys):
    rc = verify_assets.main(["--assets-dir", str(assets_dir)])
    out = capsys.readouterr().out
    assert rc == 0, out
    # no demo images in the dir -> vgg sanity fallback, golden skipped
    assert "vgg_sanity: PASS" in out
    assert "dists_weights: PASS" in out
    assert "fr_model: PASS" in out
    assert "dinov2: SKIP" in out
    assert "featup_jbu: SKIP" in out
    assert "nr_model: SKIP" in out


def test_verify_assets_empty_dir(tmp_path, capsys):
    rc = verify_assets.main(["--assets-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 2
    assert "nothing to verify" in out


def test_verify_assets_detects_corrupt_weights(assets_dir, tmp_path,
                                               capsys):
    w = dists.load_pretrained_weights()
    torch.save({
        "alpha": torch.from_numpy(
            np.asarray(w.alpha).reshape(1, 1475, 1, 1) * 2.0),
        "beta": torch.from_numpy(
            np.asarray(w.beta).reshape(1, 1475, 1, 1)),
    }, tmp_path / "weights.pt")
    rc = verify_assets.main([
        "--assets-dir", str(tmp_path),
        "--dists-weights", str(tmp_path / "weights.pt"),
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "dists_weights: FAIL" in out


def test_verify_assets_nr_model(tmp_path, capsys):
    """An exported reference-layout NR model.pth (the compat round-trip
    format) imports, its architecture is inferred from the keys, and the
    probe forward passes."""
    from nerf_qa_tpu.compat.export_torch import (
        export_nr_state_dict,
        save_state_dict,
    )
    from nerf_qa_tpu.config import NRModelConfig
    from nerf_qa_tpu.models.nr.model import NRModel
    from nerf_qa_tpu.models.nr.vit import ViTS14

    model = NRModel(
        init_vgg16_params(seed=0),
        cfg=NRModelConfig(transformer_decoder_depth=2, refine_up_depth=2),
        render_size=128, sem_size=112, vit=ViTS14(depth=1),
    )
    params, _ = model.init(seed=0)
    save_state_dict(export_nr_state_dict(params),
                    str(tmp_path / "model_nr.pth"))
    rc = verify_assets.main([
        "--assets-dir", str(tmp_path),
        "--nr-model", str(tmp_path / "model_nr.pth"),
    ])
    out = capsys.readouterr().out
    assert "nr_model: PASS" in out, out
    assert rc == 0, out
