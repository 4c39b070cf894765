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

import math
from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def interpolate_pos_embed(patch_pos: np.ndarray, grid_size: int) -> np.ndarray:
    """Resample a (1, M*M, D) patch pos-embed grid to (1, grid², D).

    Real ``dinov2_vits14_reg`` checkpoints carry a 37x37 grid (1369
    patches, trained at 518²); :class:`ViTS14` at 224² needs 16x16.
    This mirrors DINOv2's own ``interpolate_pos_encoding`` exactly:
    bicubic, ``scale_factor=(grid + 0.1) / M`` (interpolate_offset=0.1),
    antialias off (dinov2 vision_transformer.py).
    """
    n = patch_pos.shape[1]
    m = int(round(math.sqrt(n)))
    if m * m != n:
        raise ValueError(f"pos_embed patch count {n} is not a square grid")
    if m == grid_size:
        return patch_pos.astype(np.float32)
    import torch

    t = torch.from_numpy(
        np.ascontiguousarray(patch_pos.astype(np.float32))
    ).reshape(1, m, m, -1).permute(0, 3, 1, 2)
    scale = float(grid_size + 0.1) / m
    out = torch.nn.functional.interpolate(
        t, scale_factor=(scale, scale), mode="bicubic", antialias=False
    )
    assert out.shape[-2:] == (grid_size, grid_size), out.shape
    return (
        out.permute(0, 2, 3, 1).reshape(1, grid_size * grid_size, -1).numpy()
    )


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
                       num_registers: int = 4, grid_size: int = 16) -> dict:
    """dinov2_vits14_reg state_dict -> ViTS14 flax params dict.

    ``grid_size`` is the model's patch grid (sem_size // 14; 16 for the
    224² NR input). Checkpoints trained at other resolutions (the real
    hub checkpoint has a 37x37 grid) are bicubically resampled with
    DINOv2's own interpolation convention."""
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
    # drop the cls row (ours is patch-only), resample to the model grid
    params["pos_embed"] = interpolate_pos_embed(pos[:, 1:], grid_size)
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


def load_dinov2_from_torch_file(path: str, depth: int = 12,
                                grid_size: int = 16) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # some hub checkpoints nest under 'model' or 'teacher'
    for key in ("model", "teacher"):
        if key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    # FeatUp hub checkpoints prefix the backbone under 'model.model.'
    prefixed = {k for k in obj if k.startswith("model.model.")}
    if prefixed:
        obj = {k[len("model.model."):]: v for k, v in obj.items()
               if k.startswith("model.model.")}
    return convert_dinov2_vit(obj, depth=depth, grid_size=grid_size)
