"""FeatUp JBU upsampler checkpoint converter (torch hub -> flax params).

Reference behavior: the NR v7/v8 semantic encoder is
``torch.hub.load("mhamilton723/FeatUp", vit_model)`` whose ``upsampler``
(a FeatUp ``JBUStack``) provides ``up1..up4`` learned-JBU stages and a
``fixup_proj`` projection (model_nr_v8.py:112-136). This maps that
checkpoint layout onto :class:`nerf_qa_tpu.models.nr.featup.JBUStack`:

torch key (upsampler.*)              -> flax param
upN.range_temp                       -> upN.range_temp ()
upN.sigma_spatial                    -> upN.sigma_spatial ()
upN.range_proj.0.{weight,bias}       -> upN.range_proj_in.{kernel,bias}
upN.range_proj.3.{weight,bias}       -> upN.range_proj_out.{kernel,bias}
fixup_proj.1.{weight,bias}           -> fixup_proj.{kernel,bias}

(range_proj is FeatUp's Sequential(Conv1x1, GELU, Dropout2d, Conv1x1) —
indices 0 and 3 are the convs; fixup_proj is Sequential(Dropout2d,
Conv1x1) — index 1 is the conv.) Torch conv kernels are OIHW -> HWIO.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv1x1(state: Mapping, key: str) -> dict:
    w = _np(state[f"{key}.weight"]).astype(np.float32)  # (O, I, 1, 1)
    return {
        "kernel": np.transpose(w, (2, 3, 1, 0)),  # -> (1, 1, I, O)
        "bias": _np(state[f"{key}.bias"]).astype(np.float32),
    }


def convert_featup_jbu(state: Mapping) -> dict:
    """FeatUp ``upsampler`` state_dict -> JBUStack flax params dict.

    Accepts keys with or without the ``upsampler.`` prefix (the full hub
    model state_dict vs the upsampler submodule's)."""
    prefixed = {k for k in state if k.startswith("upsampler.")}
    if prefixed:
        state = {k[len("upsampler."):]: v for k, v in state.items()
                 if k.startswith("upsampler.")}
    params: dict = {}
    for i in range(1, 5):
        u = f"up{i}"
        params[u] = {
            "range_temp": _np(state[f"{u}.range_temp"]).reshape(()).astype(
                np.float32
            ),
            "sigma_spatial": _np(state[f"{u}.sigma_spatial"]).reshape(())
            .astype(np.float32),
            "range_proj_in": _conv1x1(state, f"{u}.range_proj.0"),
            "range_proj_out": _conv1x1(state, f"{u}.range_proj.3"),
        }
    params["fixup_proj"] = _conv1x1(state, "fixup_proj.1")
    return params


def load_featup_from_torch_file(path: str) -> dict:
    """Load a FeatUp hub checkpoint file (full model or upsampler-only
    state_dict) and convert the JBU upsampler."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("model", "state_dict"):
        if key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return convert_featup_jbu(obj)
