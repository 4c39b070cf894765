"""DINOv2 ViT checkpoint converter (torch hub state_dict -> flax params).

Reference behavior: the NR models load
``torch.hub.load('facebookresearch/dinov2', 'dinov2_vits14_reg')``
(model.py:64) / FeatUp-wrapped backbones (model_nr_v8.py:116). This maps
that checkpoint layout onto :class:`nerf_qa_tpu.models.nr.vit.ViTS14`:

torch key                          -> flax param
patch_embed.proj.{weight,bias}     -> patch_embed.{kernel(HWIO),bias}
cls_token / register_tokens        -> cls_token / register_tokens
pos_embed                          -> pos_embed (patch rows only; the
                                      torch tensor holds [cls | patches])
blocks.N.norm1.{weight,bias}       -> blockN.LayerNorm_0.{scale,bias}
blocks.N.attn.qkv.{weight,bias}    -> blockN.Attention_0.Dense_0
blocks.N.attn.proj.{weight,bias}   -> blockN.Attention_0.Dense_1
blocks.N.ls1.gamma                 -> blockN.LayerScale_0.gamma
blocks.N.norm2.{weight,bias}       -> blockN.LayerNorm_1.{scale,bias}
blocks.N.mlp.fc1/fc2               -> blockN.Mlp_0.Dense_0/Dense_1
blocks.N.ls2.gamma                 -> blockN.LayerScale_1.gamma
norm.{weight,bias}                 -> norm.{scale,bias}

Torch Linear weights are (out, in) -> transposed to flax (in, out); the
patch conv is OIHW -> HWIO.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _dense(state: Mapping, prefix: str) -> dict:
    return {
        "kernel": _np(state[f"{prefix}.weight"]).T.astype(np.float32),
        "bias": _np(state[f"{prefix}.bias"]).astype(np.float32),
    }


def _layernorm(state: Mapping, prefix: str) -> dict:
    return {
        "scale": _np(state[f"{prefix}.weight"]).astype(np.float32),
        "bias": _np(state[f"{prefix}.bias"]).astype(np.float32),
    }


def convert_dinov2_vit(state: Mapping, depth: int = 12,
                       num_registers: int = 4) -> dict:
    """dinov2_vits14_reg state_dict -> ViTS14 flax params dict."""
    w = _np(state["patch_embed.proj.weight"])  # (D, 3, 14, 14)
    params: dict = {
        "patch_embed": {
            "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "bias": _np(state["patch_embed.proj.bias"]).astype(np.float32),
        },
        "cls_token": _np(state["cls_token"]).astype(np.float32),
        "register_tokens": _np(state["register_tokens"]).astype(np.float32),
        "norm": _layernorm(state, "norm"),
    }
    pos = _np(state["pos_embed"]).astype(np.float32)  # (1, 1+P, D)
    params["pos_embed"] = pos[:, 1:]  # drop the cls row; ours is patch-only
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "LayerNorm_0": _layernorm(state, f"{b}.norm1"),
            "Attention_0": {
                "Dense_0": _dense(state, f"{b}.attn.qkv"),
                "Dense_1": _dense(state, f"{b}.attn.proj"),
            },
            "LayerScale_0": {
                "gamma": _np(state[f"{b}.ls1.gamma"]).astype(np.float32)
            },
            "LayerNorm_1": _layernorm(state, f"{b}.norm2"),
            "Mlp_0": {
                "Dense_0": _dense(state, f"{b}.mlp.fc1"),
                "Dense_1": _dense(state, f"{b}.mlp.fc2"),
            },
            "LayerScale_1": {
                "gamma": _np(state[f"{b}.ls2.gamma"]).astype(np.float32)
            },
        }
    return params


def load_dinov2_from_torch_file(path: str, depth: int = 12) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # some hub checkpoints nest under 'model' or 'teacher'
    for key in ("model", "teacher"):
        if key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return convert_dinov2_vit(obj, depth=depth)
