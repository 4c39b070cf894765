"""compat/export_torch: jax -> torch model.pth export (the inverse of the
torch_nr / checkpoint importers), round-tripped to <1e-6.

NR: export must be the exact inverse of convert_nr_decoder on a
reference-layout state dict (reuses the oracle fixture layout from
test_nr_torch_converter). FR: an init'd FR param tree exports to the
model_stats.NeRFQAModel.state_dict() layout and re-imports bit-exactly
through convert_fr_model_from_torch, including the embedded VGG stages
and L2pooling/mean/std buffers (DISTS_pt.py:27-80).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerf_qa_tpu.compat.checkpoint import (  # noqa: E402
    convert_fr_model_from_torch,
    save_checkpoint,
)
from nerf_qa_tpu.compat.export_torch import (  # noqa: E402
    export_fr_state_dict,
    export_nr_state_dict,
    save_state_dict,
)
from nerf_qa_tpu.compat.torch_nr import (  # noqa: E402
    convert_nr_decoder,
    extract_dists_alpha_beta,
)
from nerf_qa_tpu.config import FRModelConfig  # noqa: E402
from nerf_qa_tpu.core import dists  # noqa: E402
from nerf_qa_tpu.core.vgg import init_vgg16_params  # noqa: E402
from nerf_qa_tpu.models import fr  # noqa: E402
from tests.test_nr_torch_converter import make_state_dict  # noqa: E402


def test_nr_export_inverts_import():
    sd = make_state_dict(np.random.default_rng(3))
    params = convert_nr_decoder(sd)
    out = export_nr_state_dict(params)
    assert set(out) == set(sd), (
        sorted(set(sd) - set(out)), sorted(set(out) - set(sd)))
    for k in sd:
        np.testing.assert_allclose(
            out[k].numpy(), sd[k].numpy(), atol=1e-6, err_msg=k)


def test_nr_export_import_export_fixpoint():
    """import(export(params)) == params exactly (both directions hold)."""
    sd = make_state_dict(np.random.default_rng(5))
    params = convert_nr_decoder(sd)
    params2 = convert_nr_decoder(
        {k: v for k, v in export_nr_state_dict(params).items()})
    flat1 = jax_flat(params)
    flat2 = jax_flat(params2)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(flat1[k], flat2[k], atol=1e-6,
                                   err_msg=k)


def jax_flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(jax_flat(v, key + "."))
        else:
            out[key] = np.asarray(v)
    return out


@pytest.mark.parametrize("regression_type", ["logistic", "linear"])
def test_fr_export_round_trip(tmp_path, regression_type):
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 0.6, 24)
    y = 5.0 - 4.0 * x + rng.normal(0, 0.05, 24)
    cfg = FRModelConfig(regression_type=regression_type)
    weights = dists.load_pretrained_weights(cfg.dists)
    params = fr.init_params(x, y, cfg, dists_weights=weights)
    vgg = init_vgg16_params(seed=0)

    sd = export_fr_state_dict(params, vgg_params=vgg)
    path = str(tmp_path / "model.pth")
    save_state_dict(sd, path)

    head, ab, vgg2 = convert_fr_model_from_torch(path)
    if regression_type == "logistic":
        for i in range(1, 5):
            np.testing.assert_allclose(
                head[f"head.b{i}"], np.asarray(params["head"][f"b{i}"]),
                atol=1e-6)
    else:
        np.testing.assert_allclose(
            head["head.weight"], np.asarray(params["head"]["weight"]),
            atol=1e-6)
        np.testing.assert_allclose(
            head["head.bias"], np.asarray(params["head"]["bias"]),
            atol=1e-6)
    np.testing.assert_allclose(ab["alpha"], np.asarray(weights.alpha),
                               atol=1e-6)
    np.testing.assert_allclose(ab["beta"], np.asarray(weights.beta),
                               atol=1e-6)
    for si in range(1, 6):
        for li, layer in enumerate(vgg[f"stage{si}"]):
            np.testing.assert_allclose(
                vgg2[f"stage{si}"][li]["kernel"],
                np.asarray(layer["kernel"]), atol=1e-6)
    # reference-module buffers present (DISTS_pt.py:20,54-55): L2pooling
    # hann filters + ImageNet mean/std, so load_state_dict is clean
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    for key, c in [("dists_model.stage2.4.filter", 64),
                   ("dists_model.stage3.9.filter", 128),
                   ("dists_model.stage4.16.filter", 256),
                   ("dists_model.stage5.23.filter", 512)]:
        assert loaded[key].shape == (c, 1, 3, 3)
        np.testing.assert_allclose(loaded[key].sum(dim=(1, 2, 3)).numpy(),
                                   np.ones(c), atol=1e-6)
    assert loaded["dists_model.mean"].shape == (1, 3, 1, 1)


def test_nr_export_cli_from_orbax(tmp_path):
    """orbax NR checkpoint -> CLI -> model.pth -> importer round-trip,
    incl. the fine-tuned alpha/beta travelling under encoder.dists.*"""
    from nerf_qa_tpu.compat.export_torch import main as export_main

    sd = make_state_dict(np.random.default_rng(7))
    params = convert_nr_decoder(sd)
    rng = np.random.default_rng(11)
    ab = {"alpha": rng.uniform(0, 0.1, 1475).astype(np.float32),
          "beta": rng.uniform(0, 0.1, 1475).astype(np.float32)}
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 3,
                    {"params": params, "state": {},
                     "dists_alpha_beta": ab})
    out = str(tmp_path / "model.pth")
    export_main([ckpt_dir, out, "--kind", "nr"])

    loaded = torch.load(out, map_location="cpu", weights_only=False)
    ab2 = extract_dists_alpha_beta(loaded)
    np.testing.assert_allclose(ab2["alpha"], ab["alpha"], atol=1e-6)
    np.testing.assert_allclose(ab2["beta"], ab["beta"], atol=1e-6)
    params2 = convert_nr_decoder(loaded)
    flat1, flat2 = jax_flat(params), jax_flat(params2)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(flat1[k], flat2[k], atol=1e-6,
                                   err_msg=k)
