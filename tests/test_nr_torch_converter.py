"""NR decoder checkpoint converter (compat/torch_nr) against a torch
oracle that mirrors the reference v8 decoder semantics
(model_nr_v8.py:53-104,190-236; nerf_qa/layers/block.py:36-87 with
qkv_bias=False, init_values=None) on a scaled-down channel schedule.

The fake state dict uses the REAL reference key names and tensor layouts
(Conv2d OIHW, ConvTranspose2d (in,out,kh,kw), Linear (out,in), FeatUp
ChannelNorm's nested ``norm_layer.norm``), per the converter-testing
standard set by tests/test_vit_converter.py.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from nerf_qa_tpu.compat.torch_nr import (  # noqa: E402
    convert_nr_decoder,
    extract_dists_alpha_beta,
)
from nerf_qa_tpu.config import NRModelConfig  # noqa: E402
from nerf_qa_tpu.models.nr.decoder import NRDecoder  # noqa: E402

DISTS_CHNS = (3, 8, 16, 24, 32, 32)
SEM = 16
RS = dict(refine_scale1=1.0, refine_scale2=0.1,
          refine_scale3=0.1, refine_scale4=0.1)


def _t(rng, *shape):
    return torch.tensor(rng.normal(0, 0.05, shape).astype(np.float32))


def make_state_dict(rng):
    """Reference-layout v8 decoder state dict on the reduced schedule."""
    sd = {}
    rev = list(reversed(DISTS_CHNS))  # [32,32,24,16,8,3]
    mix = rev[0] + SEM  # 48

    for i in range(2):  # transformer_decoder_depth = 2
        p = f"transformer_decoder.{i}"
        sd[f"{p}.norm1.weight"] = _t(rng, mix) + 1.0
        sd[f"{p}.norm1.bias"] = _t(rng, mix)
        sd[f"{p}.attn.qkv.weight"] = _t(rng, 3 * mix, mix)  # qkv_bias=False
        sd[f"{p}.attn.proj.weight"] = _t(rng, mix, mix)
        sd[f"{p}.attn.proj.bias"] = _t(rng, mix)
        sd[f"{p}.norm2.weight"] = _t(rng, mix) + 1.0
        sd[f"{p}.norm2.bias"] = _t(rng, mix)
        sd[f"{p}.mlp.fc1.weight"] = _t(rng, 4 * mix, mix)
        sd[f"{p}.mlp.fc1.bias"] = _t(rng, 4 * mix)
        sd[f"{p}.mlp.fc2.weight"] = _t(rng, mix, 4 * mix)
        sd[f"{p}.mlp.fc2.bias"] = _t(rng, mix)

    def conv_layer(prefix, cin, cout):
        sd[f"{prefix}.conv.weight"] = _t(rng, cout, cin, 3, 3)
        sd[f"{prefix}.conv.bias"] = _t(rng, cout)
        sd[f"{prefix}.norm_layer.norm.weight"] = _t(rng, cout) + 1.0
        sd[f"{prefix}.norm_layer.norm.bias"] = _t(rng, cout)

    conv_layer("trans2sem", mix, SEM)

    for i in range(6):
        cin = rev[i] + SEM
        cout = (rev[i + 1] if i < 5 else rev[i]) + SEM
        conv_layer(f"decoder.{i}.block.0", cin, cin)
        conv_layer(f"decoder.{i}.block.1", cin, cin)
        up = f"decoder.{i}.upsample_layer"
        if i < 4:  # ConvTransposeLayer: (in, out, kh, kw)
            sd[f"{up}.conv.weight"] = _t(rng, cin, cout, 3, 3)
            sd[f"{up}.conv.bias"] = _t(rng, cout)
            sd[f"{up}.norm_layer.norm.weight"] = _t(rng, cout) + 1.0
            sd[f"{up}.norm_layer.norm.bias"] = _t(rng, cout)
        else:
            conv_layer(up, cin, cout)
    return sd


# ---- torch oracle (reference semantics, independent implementation) ----

def _channel_norm(x, w, b):
    # FeatUp ChannelNorm: LayerNorm over C at every pixel (eps=1e-5)
    y = x.permute(0, 2, 3, 1)
    y = F.layer_norm(y, (y.shape[-1],), w, b, eps=1e-5)
    return y.permute(0, 3, 1, 2)


def _conv_layer(sd, p, x, act):
    x = F.conv2d(x, sd[f"{p}.conv.weight"], sd[f"{p}.conv.bias"], padding=1)
    x = _channel_norm(x, sd[f"{p}.norm_layer.norm.weight"],
                      sd[f"{p}.norm_layer.norm.bias"])
    return F.gelu(x) if act else x


def _block(sd, p, x):
    h = F.layer_norm(x, (x.shape[-1],), sd[f"{p}.norm1.weight"],
                     sd[f"{p}.norm1.bias"], eps=1e-5)
    B, N, C = h.shape
    H = 8
    qkv = F.linear(h, sd[f"{p}.attn.qkv.weight"])
    q, k, v = qkv.reshape(B, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
    a = torch.softmax(q @ k.transpose(-2, -1) * (C // H) ** -0.5, dim=-1)
    h = (a @ v).transpose(1, 2).reshape(B, N, C)
    h = F.linear(h, sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
    x = x + h  # ls1 = Identity
    h = F.layer_norm(x, (x.shape[-1],), sd[f"{p}.norm2.weight"],
                     sd[f"{p}.norm2.bias"], eps=1e-5)
    h = F.linear(h, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
    return x + h  # ls2 = Identity


def oracle_forward(sd, dists_feats, sem_feats, sem_pyramid):
    """model_nr_v8.py pred_gt_dists_feats on NCHW torch tensors."""
    top = dists_feats[-1]
    B, C0, gh, gw = top.shape
    enc = torch.cat([top, sem_feats], dim=1)
    C = enc.shape[1]
    tokens = enc.reshape(B, C, gh * gw).permute(0, 2, 1)
    for i in range(2):
        tokens = _block(sd, f"transformer_decoder.{i}", tokens)
    trans = tokens.permute(0, 2, 1).reshape(B, C, gh, gw)
    mixed = _conv_layer(sd, "trans2sem", enc + RS["refine_scale3"] * trans,
                        act=True)
    trans_decode = sem_feats + RS["refine_scale4"] * mixed

    fm = torch.cat([top, trans_decode], dim=1)
    rev = list(reversed(DISTS_CHNS))
    preds = []
    for i in range(6):
        x = fm * RS["refine_scale1"] + torch.cat(
            [dists_feats[5 - i], sem_pyramid[i]], dim=1)
        h = _conv_layer(sd, f"decoder.{i}.block.0", x, act=True)
        h = _conv_layer(sd, f"decoder.{i}.block.1", h, act=False)
        fm = RS["refine_scale2"] * h + x
        preds.append(fm[:, : rev[i]])
        up = f"decoder.{i}.upsample_layer"
        if i < 4:
            fm = F.conv_transpose2d(fm, sd[f"{up}.conv.weight"],
                                    sd[f"{up}.conv.bias"], stride=2,
                                    padding=1, output_padding=1)
            fm = _channel_norm(fm, sd[f"{up}.norm_layer.norm.weight"],
                               sd[f"{up}.norm_layer.norm.bias"])
        else:
            fm = _conv_layer(sd, up, fm, act=False)
    return list(reversed(preds))


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(3)
    sizes = [64, 64, 32, 16, 8, 4]
    dists_feats = [rng.normal(0, 0.3, (1, s, s, c)).astype(np.float32)
                   for s, c in zip(sizes, DISTS_CHNS)]
    sem_feats = rng.normal(0, 0.3, (1, 4, 4, SEM)).astype(np.float32)
    pyr_sizes = [4, 8, 16, 32, 64, 64]
    sem_pyramid = [rng.normal(0, 0.3, (1, s, s, SEM)).astype(np.float32)
                   for s in pyr_sizes]
    return dists_feats, sem_feats, sem_pyramid


def _decoder():
    cfg = NRModelConfig(version=8, dropout_rate=0.0, **RS)
    return NRDecoder(cfg=cfg, dists_chns=DISTS_CHNS, sem_dim=SEM)


def test_converted_tree_matches_init_structure(feats):
    import jax

    rng = np.random.default_rng(0)
    sd = make_state_dict(rng)
    params = convert_nr_decoder(sd)

    dists_feats, sem_feats, sem_pyramid = feats
    dec = _decoder()
    variables = dec.init(jax.random.PRNGKey(0), dists_feats, sem_feats,
                         sem_pyramid, True, None)
    want = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    got = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert want == got


def test_converted_decoder_matches_torch_oracle(feats):
    import jax

    rng = np.random.default_rng(0)
    sd = make_state_dict(rng)
    params = convert_nr_decoder(sd)
    dists_feats, sem_feats, sem_pyramid = feats

    predicted, score_reg = _decoder().apply(
        {"params": params}, dists_feats, sem_feats, sem_pyramid, True, None
    )
    assert score_reg is None

    t = lambda a: torch.tensor(a).permute(0, 3, 1, 2)
    want = oracle_forward(sd, [t(f) for f in dists_feats], t(sem_feats),
                          [t(f) for f in sem_pyramid])
    assert len(predicted) == len(want) == 6
    for ours, ref in zip(predicted, want):
        ref = ref.permute(0, 2, 3, 1).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_alpha_beta_extraction():
    rng = np.random.default_rng(1)
    sd = make_state_dict(rng)
    sd["encoder.dists.alpha"] = _t(rng, 1, 59, 1, 1)
    sd["encoder.dists.beta"] = _t(rng, 1, 59, 1, 1)
    ab = extract_dists_alpha_beta(sd)
    assert ab is not None and ab["alpha"].shape == (59,)
    assert extract_dists_alpha_beta(make_state_dict(rng)) is None


def test_converter_cli_roundtrip(tmp_path):
    """CLI: torch state-dict file -> orbax checkpoint dir consumable by
    restore_checkpoint (score --nr-ckpt / train_nr --init-from glue)."""
    import jax

    from nerf_qa_tpu.compat.checkpoint import restore_checkpoint
    from nerf_qa_tpu.compat.torch_nr import main as convert_main

    rng = np.random.default_rng(2)
    sd = make_state_dict(rng)
    sd["encoder.dists.alpha"] = _t(rng, 1, 59, 1, 1)
    sd["encoder.dists.beta"] = _t(rng, 1, 59, 1, 1)
    pth = str(tmp_path / "model_state.pth")
    torch.save(sd, pth)

    out_dir = str(tmp_path / "ckpt")
    convert_main([pth, out_dir])
    restored = restore_checkpoint(out_dir)
    assert restored is not None
    step, ckpt = restored
    want = convert_nr_decoder({k: v for k, v in sd.items()
                               if not k.startswith("encoder.")})
    got = ckpt["params"]
    same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), got, want)
    assert all(jax.tree_util.tree_leaves(same))
    np.testing.assert_allclose(ckpt["dists_alpha_beta"]["alpha"],
                               np.asarray(sd["encoder.dists.alpha"]).reshape(-1))


def _fake_dists_stages(rng, prefix):
    """Embedded-DISTS VGG stage keys exactly as DISTS_pt.py:31-49 saves
    them (torchvision feature indices preserved as submodule names)."""
    from nerf_qa_tpu.compat.torch_weights import (
        VGG16_STAGES,
        _STAGE_CONV_INDICES,
    )

    sd = {}
    for si, (spec, idxs) in enumerate(zip(VGG16_STAGES, _STAGE_CONV_INDICES)):
        for (cin, cout), idx in zip(spec, idxs):
            sd[f"{prefix}stage{si + 1}.{idx}.weight"] = _t(rng, cout, cin, 3, 3)
            sd[f"{prefix}stage{si + 1}.{idx}.bias"] = _t(rng, cout)
    # L2pooling hann buffers must be ignored by the extractor
    sd[f"{prefix}stage2.4.filter"] = _t(rng, 64, 1, 3, 3)
    return sd


def test_embedded_vgg_extraction_and_cli_npz(tmp_path):
    from nerf_qa_tpu.compat.torch_nr import main as convert_main
    from nerf_qa_tpu.compat.torch_weights import (
        extract_vgg16_from_dists,
        load_vgg16_from_npz,
    )

    rng = np.random.default_rng(4)
    sd = make_state_dict(rng)
    sd.update(_fake_dists_stages(rng, "encoder.dists."))
    vgg = extract_vgg16_from_dists(sd)
    assert vgg is not None
    assert vgg["stage1"][0]["kernel"].shape == (3, 3, 3, 64)
    assert vgg["stage5"][2]["kernel"].shape == (3, 3, 512, 512)
    np.testing.assert_allclose(
        vgg["stage1"][0]["kernel"],
        np.asarray(sd["encoder.dists.stage1.0.weight"]).transpose(2, 3, 1, 0),
    )

    pth = str(tmp_path / "model_state.pth")
    torch.save(sd, pth)
    out_dir = str(tmp_path / "ckpt")
    convert_main([pth, out_dir])
    import os

    npz = os.path.join(out_dir, "vgg16.npz")
    assert os.path.exists(npz)
    again = load_vgg16_from_npz(npz)
    np.testing.assert_allclose(again["stage3"][1]["bias"],
                               vgg["stage3"][1]["bias"])


def test_fr_model_full_import(tmp_path):
    """convert_fr_model_from_torch: head + fine-tuned alpha/beta + the
    embedded frozen VGG from one FR model.pth (model_stats.py layout)."""
    from nerf_qa_tpu.compat.checkpoint import convert_fr_model_from_torch

    rng = np.random.default_rng(5)
    sd = {
        "b1": _t(rng, 1), "b2": _t(rng, 1), "b3": _t(rng, 1),
        "b4": _t(rng, 1),
        "dists_model.alpha": _t(rng, 1, 1475, 1, 1),
        "dists_model.beta": _t(rng, 1, 1475, 1, 1),
    }
    sd.update(_fake_dists_stages(rng, "dists_model."))
    pth = str(tmp_path / "model.pth")
    torch.save(sd, pth)
    head, ab, vgg = convert_fr_model_from_torch(pth)
    assert set(k for k in head if k.startswith("head.")) == {
        "head.b1", "head.b2", "head.b3", "head.b4"}
    assert ab is not None and ab["alpha"].shape == (1475,)
    assert vgg is not None
    assert vgg["stage4"][0]["kernel"].shape == (3, 3, 256, 512)
