"""Torch checkpoint converters (run on host, torch CPU only).

Covers the reference's pretrained-asset surface:
* ``weights.pt`` α/β perceptual weights (DISTS_pt.py:62-80) -> flat npz
* torchvision VGG16 ``features`` state_dict -> NHWC/HWIO pyramid params
  (DISTS_pt.py:30-49 stage split)
* FR ``model.pth`` head params (model_stats.py:45-60)
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from nerf_qa_tpu.core.vgg import VGG16_STAGES

# torchvision vgg16 'features' conv indices per DISTS stage
# (DISTS_pt.py:36-49): stage1=convs 0,2; stage2=5,7; stage3=10,12,14;
# stage4=17,19,21; stage5=24,26,28.
_STAGE_CONV_INDICES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_alpha_beta(weights: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """weights.pt dict {'alpha','beta'} (1,1475,1,1) -> flat (1475,) arrays."""
    alpha = _to_numpy(weights["alpha"]).reshape(-1).astype(np.float32)
    beta = _to_numpy(weights["beta"]).reshape(-1).astype(np.float32)
    assert alpha.shape == beta.shape == (1475,), (alpha.shape, beta.shape)
    return {"alpha": alpha, "beta": beta}


def convert_lpips_lin(state_dict: Mapping[str, Any]) -> list[np.ndarray]:
    """Official lpips (Zhang 2018) checkpoint -> 5 per-channel weight
    vectors. The ``vgg.pth`` from richzhang/PerceptualSimilarity stores
    ``lin{k}.model.1.weight`` 1x1 convs of shape (1, C_k, 1, 1)."""
    out = []
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in state_dict:
                out.append(_to_numpy(state_dict[key]).reshape(-1)
                           .astype(np.float32))
                break
        else:
            raise KeyError(f"lpips lin{k} weight not found")
    return out


def convert_vgg16_features(state_dict: Mapping[str, Any]):
    """torchvision ``vgg16().features.state_dict()`` -> pyramid params.

    Accepts either bare feature keys (``'0.weight'``) or full-model keys
    (``'features.0.weight'``). Torch conv kernels are OIHW; TPU params are
    HWIO.
    """
    def get(idx: int, leaf: str) -> np.ndarray:
        for key in (f"{idx}.{leaf}", f"features.{idx}.{leaf}"):
            if key in state_dict:
                return _to_numpy(state_dict[key])
        raise KeyError(f"vgg16 features index {idx} ({leaf}) not found")

    params = {}
    for si, (stage_spec, conv_idxs) in enumerate(
        zip(VGG16_STAGES, _STAGE_CONV_INDICES)
    ):
        layers = []
        for (cin, cout), idx in zip(stage_spec, conv_idxs):
            w = get(idx, "weight").astype(np.float32)  # (O, I, H, W)
            b = get(idx, "bias").astype(np.float32)
            assert w.shape == (cout, cin, 3, 3), (w.shape, (cout, cin))
            layers.append({
                "kernel": np.transpose(w, (2, 3, 1, 0)),  # -> HWIO
                "bias": b,
            })
        params[f"stage{si + 1}"] = layers
    return params


def extract_vgg16_from_dists(state_dict: Mapping[str, Any]):
    """Pyramid params from a DISTS module EMBEDDED in a saved reference
    model (NR model.pth: ``encoder.dists.stageK.{idx}.*``; FR model.pth:
    ``dists_model.stageK.{idx}.*``; or a bare DISTS ``stageK.{idx}.*``).

    DISTS_pt.py:31-49 preserves torchvision feature indices as the
    stage submodule names, so stripping ``stageK.`` recovers the bare
    ``{idx}.weight`` layout convert_vgg16_features accepts (L2pooling's
    ``filter`` buffers are skipped). Returns None when no stage keys
    are present under any known prefix."""
    import re

    pat = re.compile(r"stage[1-5]\.(\d+)\.(weight|bias)$")
    for pre in ("encoder.dists.", "dists_model.", "dists.", ""):
        sub = {}
        for k, v in state_dict.items():
            if not k.startswith(pre):
                continue
            m = pat.fullmatch(k[len(pre):])
            if m:
                sub[f"{m.group(1)}.{m.group(2)}"] = v
        if sub:
            return convert_vgg16_features(sub)
    return None


def load_vgg16_from_torch_file(path: str):
    """Load a torchvision VGG16 checkpoint file and convert it."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return convert_vgg16_features(obj)


def export_vgg16_to_npz(params, path: str) -> None:
    """Flat-key npz export of converted pyramid params (fast reload)."""
    flat = {}
    for sname, layers in params.items():
        for i, layer in enumerate(layers):
            flat[f"{sname}.{i}.kernel"] = np.asarray(layer["kernel"])
            flat[f"{sname}.{i}.bias"] = np.asarray(layer["bias"])
    np.savez(path, **flat)


def load_vgg16_from_npz(path: str):
    data = np.load(path)
    params: dict[str, list] = {}
    for si, stage in enumerate(VGG16_STAGES):
        name = f"stage{si + 1}"
        params[name] = [
            {"kernel": data[f"{name}.{i}.kernel"], "bias": data[f"{name}.{i}.bias"]}
            for i in range(len(stage))
        ]
    return params
