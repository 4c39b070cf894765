"""Import a trained reference NR model (train-nr.py's saved state) into
the TPU decoder's param tree.

Reference artifact: ``train-nr.py`` trains ``model_nr_v8.NRModel`` and
checkpoints it with torch.save. The trainable part is the decoder —
``transformer_decoder.{i}`` (vendored DINOv2 blocks, nerf_qa/layers/
block.py:36-77 with qkv_bias=False and init_values=None, i.e. no qkv
bias and Identity LayerScales), ``trans2sem`` (ConvLayer,
model_nr_v8.py:196), and ``decoder.{i}`` RefineUp stages
(model_nr_v8.py:53-104: ``block.{j}`` ConvLayers + ``upsample_layer``)
— everything else (``encoder.*``) is the frozen DISTS/FeatUp encoder,
whose weights load through their own converters (torch_weights /
torch_vit / torch_featup). The fine-tuned DISTS α/β, if present under
``encoder.dists.alpha/beta``, are extracted too.

Layout conversions (verified against torch oracles, see
tests/test_nr_torch_converter.py):

* Conv2d       OIHW -> HWIO (transpose 2,3,1,0)
* ConvTranspose2d (I,O,kh,kw) -> spatial FLIP then HWIO (2,3,0,1):
  torch's transposed conv correlates with the flipped kernel relative to
  flax's ``ConvTranspose``; with ``padding=((1,2),(1,2))`` (the layer's
  setting) the output alignment is exactly torch's k3/s2/p1/outp1.
* Linear       (out,in) -> transpose
* LayerNorm / FeatUp ChannelNorm weight/bias -> scale/bias
* missing qkv bias -> zeros; missing LayerScale gamma -> ones (identity)

Whole-module pickles (``torch.save(model, ...)``) need the reference's
class definitions to unpickle; export ``model.state_dict()`` on the
source machine instead (the standard torch interchange format).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def _conv(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch ConvLayer (conv + ChannelNorm) -> flax ConvLayer params."""
    out = {
        "Conv_0": {
            "kernel": _np(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{prefix}.conv.bias"]),
        }
    }
    if f"{prefix}.norm_layer.norm.weight" in sd:
        out["ChannelNorm_0"] = {
            "scale": _np(sd[f"{prefix}.norm_layer.norm.weight"]),
            "bias": _np(sd[f"{prefix}.norm_layer.norm.bias"]),
        }
    return out


def _conv_transpose(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch ConvTransposeLayer -> flax ConvTransposeLayer params."""
    w = _np(sd[f"{prefix}.conv.weight"])  # (in, out, kh, kw)
    out = {
        "ConvTranspose_0": {
            "kernel": w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy(),
            "bias": _np(sd[f"{prefix}.conv.bias"]),
        }
    }
    if f"{prefix}.norm_layer.norm.weight" in sd:
        out["ChannelNorm_0"] = {
            "scale": _np(sd[f"{prefix}.norm_layer.norm.weight"]),
            "bias": _np(sd[f"{prefix}.norm_layer.norm.bias"]),
        }
    return out


def _block(sd: Mapping[str, Any], prefix: str) -> dict:
    """Vendored DINOv2 Block -> flax TransformerBlock params."""
    qkv_w = _np(sd[f"{prefix}.attn.qkv.weight"])  # (3C, C)
    dim3, dim = qkv_w.shape
    qkv_b = (_np(sd[f"{prefix}.attn.qkv.bias"])
             if f"{prefix}.attn.qkv.bias" in sd
             else np.zeros((dim3,), np.float32))

    def gamma(name: str) -> np.ndarray:
        key = f"{prefix}.{name}.gamma"
        return _np(sd[key]) if key in sd else np.ones((dim,), np.float32)

    return {
        "LayerNorm_0": {"scale": _np(sd[f"{prefix}.norm1.weight"]),
                        "bias": _np(sd[f"{prefix}.norm1.bias"])},
        "Attention_0": {
            "Dense_0": {"kernel": qkv_w.T.copy(), "bias": qkv_b},
            "Dense_1": {"kernel": _np(sd[f"{prefix}.attn.proj.weight"]).T.copy(),
                        "bias": _np(sd[f"{prefix}.attn.proj.bias"])},
        },
        "LayerScale_0": {"gamma": gamma("ls1")},
        "LayerNorm_1": {"scale": _np(sd[f"{prefix}.norm2.weight"]),
                        "bias": _np(sd[f"{prefix}.norm2.bias"])},
        "Mlp_0": {
            "Dense_0": {"kernel": _np(sd[f"{prefix}.mlp.fc1.weight"]).T.copy(),
                        "bias": _np(sd[f"{prefix}.mlp.fc1.bias"])},
            "Dense_1": {"kernel": _np(sd[f"{prefix}.mlp.fc2.weight"]).T.copy(),
                        "bias": _np(sd[f"{prefix}.mlp.fc2.bias"])},
        },
        "LayerScale_1": {"gamma": gamma("ls2")},
    }


def convert_nr_decoder(state_dict: Mapping[str, Any],
                       upsample_stages: int | None = None) -> dict:
    """Reference NR v7/v8 state_dict -> NRDecoder param pytree.

    Handles the ChannelNorm generations (the only ones the reference ever
    trained and saved, train-nr.py:31). Structure is inferred from the
    keys: transformer depth from ``transformer_decoder.{i}``, RefineUp
    block depth from ``decoder.{i}.block.{j}``, and upsample-vs-conv tail
    layers from the ConvTranspose weight layout (a transposed conv's
    ``upsample_layer.conv.weight`` has shape (in, out, 3, 3) with
    in != out channel counts taken from the surrounding block; plain
    tail ConvLayers appear at the non-upsampling last two stages).

    ``upsample_stages``: number of leading stages whose tail layer is a
    ConvTranspose, for checkpoints trained with a modified stage count.
    Default None = the reference's num_upscales+2 construction
    (model_nr_v8.py:198: all but the last two stages upsample); a square
    tail kernel is then disambiguated by position with a warning, since
    a non-reference schedule would be silently misconverted."""
    import warnings

    sd = state_dict
    params: dict[str, Any] = {}

    n_trans = 1 + max(
        (int(k.split(".")[1]) for k in sd if k.startswith("transformer_decoder.")),
        default=-1,
    )
    for i in range(n_trans):
        params[f"trans{i}"] = _block(sd, f"transformer_decoder.{i}")
    if "trans2sem.conv.weight" in sd:
        params["trans2sem"] = _conv(sd, "trans2sem")

    n_refine = 1 + max(
        (int(k.split(".")[1]) for k in sd if k.startswith("decoder.")),
        default=-1,
    )
    for i in range(n_refine):
        depth = 1 + max(
            int(k.split(".")[3]) for k in sd
            if k.startswith(f"decoder.{i}.block.")
        )
        stage: dict[str, Any] = {}
        for j in range(depth):
            stage[f"ConvLayer_{j}"] = _conv(sd, f"decoder.{i}.block.{j}")
        up = f"decoder.{i}.upsample_layer"
        w = _np(sd[f"{up}.conv.weight"])
        block_out = _np(sd[f"decoder.{i}.block.{depth - 1}.conv.weight"]).shape[0]
        # ConvTranspose2d stores (in, out, kh, kw); Conv2d (out, in, kh, kw).
        # The upsample layer's input width equals the block output width.
        if w.shape[0] == block_out and w.shape[0] != w.shape[1]:
            stage["ConvTransposeLayer_0"] = _conv_transpose(sd, up)
        elif w.shape[1] == block_out and w.shape[0] != w.shape[1]:
            stage[f"ConvLayer_{depth}"] = _conv(sd, up)
        else:
            # square layer: shape can't tell Conv2d (out,in,kh,kw) from
            # ConvTranspose2d (in,out,kh,kw) — decide by stage schedule
            is_up = (i < upsample_stages if upsample_stages is not None
                     else i < n_refine - 2)
            if upsample_stages is None:
                warnings.warn(
                    f"decoder.{i}.upsample_layer has a square kernel; "
                    f"assuming the reference schedule "
                    f"({'ConvTranspose' if is_up else 'Conv'} at stage {i} "
                    f"of {n_refine}, model_nr_v8.py:198). Pass "
                    f"upsample_stages= if this checkpoint uses a modified "
                    f"stage count.",
                    stacklevel=2,
                )
            if is_up:
                stage["ConvTransposeLayer_0"] = _conv_transpose(sd, up)
            else:
                stage[f"ConvLayer_{depth}"] = _conv(sd, up)
        params[f"refine{i}"] = stage
    return params


def extract_dists_alpha_beta(state_dict: Mapping[str, Any]):
    """Fine-tuned DISTS α/β from the embedded frozen metric, if present."""
    # NR: encoder.dists.*; FR: dists_model.* (model_stats.py:68)
    for pre in ("encoder.dists.", "dists_model.", "dists."):
        if f"{pre}alpha" in state_dict:
            return {
                "alpha": _np(state_dict[f"{pre}alpha"]).reshape(-1),
                "beta": _np(state_dict[f"{pre}beta"]).reshape(-1),
            }
    return None


def load_nr_from_torch_file(path: str):
    """(decoder_params, alpha_beta|None, vgg_params|None) from a torch
    checkpoint file. The frozen VGG stages embedded in the saved model
    (``encoder.dists.stageK.*``) convert too, so one model.pth carries
    everything but the ViT/JBU backbones."""
    import torch

    from nerf_qa_tpu.compat.torch_weights import extract_vgg16_from_dists

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict or module")
    sd = obj.get("state_dict", obj)
    return (convert_nr_decoder(sd), extract_dists_alpha_beta(sd),
            extract_vgg16_from_dists(sd))


def main(argv=None) -> None:
    """CLI: convert a reference NR checkpoint to an orbax checkpoint dir
    consumable by ``tools/score --nr-ckpt`` / ``tools/train_nr --resume``.

    Usage: python -m nerf_qa_tpu.compat.torch_nr model_state.pth out_dir
    """
    import argparse

    from nerf_qa_tpu.compat.checkpoint import save_checkpoint

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("torch_path")
    p.add_argument("out_dir")
    args = p.parse_args(argv)
    decoder_params, alpha_beta, vgg = load_nr_from_torch_file(args.torch_path)
    ckpt = {"params": decoder_params, "state": {}}
    if alpha_beta is not None:
        ckpt["dists_alpha_beta"] = alpha_beta
    path = save_checkpoint(args.out_dir, 0, ckpt)
    print(f"wrote {path}")
    if vgg is not None:
        import os

        from nerf_qa_tpu.compat.torch_weights import export_vgg16_to_npz

        npz = os.path.join(args.out_dir, "vgg16.npz")
        export_vgg16_to_npz(vgg, npz)
        print(f"wrote {npz} (embedded frozen VGG; point "
              f"$NERF_QA_VGG_CKPT / --vgg-ckpt at it)")


if __name__ == "__main__":
    main()
