"""Pretrained-backbone resolution for every driver.

The reference's entire value proposition rests on pretrained backbones:
torchvision VGG16 for the DISTS pyramid (DISTS_pt.py:30-52), DINOv2
ViT-S/14-reg for the NR semantic encoder (model.py:64), FeatUp's JBU
upsampler (model_nr_v8.py:112-136), and the learned α/β perceptual
weights (weights.pt, DISTS_pt.py:62-80). This module makes them
first-class, driver-reachable: every CLI gains --vgg-ckpt / --dists-
weights / --vit-ckpt / --jbu-ckpt flags (add_backbone_args), with
environment-variable fallbacks so batch jobs can inject checkpoints
without editing command lines.

Resolution order per backbone:
1. explicit CLI path
2. environment variable (NERF_QA_VGG_CKPT, NERF_QA_DISTS_WEIGHTS,
   NERF_QA_VIT_CKPT, NERF_QA_JBU_CKPT)
3. bundled asset (α/β only — converted from the reference's weights.pt)
4. random init with a loud warning (FLOP-identical; quality numbers
   meaningless)

Accepted formats: .npz (converted, fast reload) or torch .pt/.pth
checkpoints (converted on the fly via compat.torch_weights /
torch_vit / torch_featup).
"""
from __future__ import annotations

import os
import sys

from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.core.vgg import init_vgg16_params

ENV_VGG = "NERF_QA_VGG_CKPT"
ENV_DISTS = "NERF_QA_DISTS_WEIGHTS"
ENV_VIT = "NERF_QA_VIT_CKPT"
ENV_JBU = "NERF_QA_JBU_CKPT"
ENV_LPIPS = "NERF_QA_LPIPS_CKPT"
ENV_STLPIPS = "NERF_QA_STLPIPS_CKPT"


def add_backbone_args(parser) -> None:
    """Attach the shared pretrained-backbone flags to an ArgumentParser."""
    g = parser.add_argument_group("pretrained backbones")
    g.add_argument("--vgg-ckpt", default=None,
                   help="torchvision VGG16 checkpoint (.pt/.pth) or "
                        f"converted .npz; ${ENV_VGG} fallback. Without it "
                        "the VGG pyramid is RANDOM (perf-identical, "
                        "quality-meaningless).")
    g.add_argument("--dists-weights", default=None,
                   help="DISTS α/β weights (.pt from the reference or "
                        f".npz); ${ENV_DISTS} fallback; defaults to the "
                        "bundled converted asset.")
    g.add_argument("--vit-ckpt", default=None,
                   help="DINOv2 ViT-S/14-reg checkpoint (.pt/.pth); "
                        f"${ENV_VIT} fallback (NR drivers).")
    g.add_argument("--jbu-ckpt", default=None,
                   help="FeatUp JBU upsampler checkpoint (.pt/.pth); "
                        f"${ENV_JBU} fallback (NR v7/v8 drivers).")


def _warn(msg: str) -> None:
    print(f"WARNING: {msg}", file=sys.stderr)


def _is_torch(path: str) -> bool:
    return path.endswith((".pt", ".pth", ".bin"))


def resolve_vgg_params(path: str | None = None, seed: int = 0):
    """VGG16 pyramid params from checkpoint, or random with a warning."""
    path = path or os.environ.get(ENV_VGG)
    if path:
        from nerf_qa_tpu.compat.torch_weights import (
            load_vgg16_from_npz,
            load_vgg16_from_torch_file,
        )

        if _is_torch(path):
            return load_vgg16_from_torch_file(path)
        return load_vgg16_from_npz(path)
    _warn(
        "no VGG16 checkpoint (--vgg-ckpt / $" + ENV_VGG + ") — using "
        "RANDOM pyramid weights; throughput is identical but quality "
        "scores are meaningless."
    )
    return init_vgg16_params(seed=seed)


def resolve_dists_weights(cfg: DISTSConfig = DISTSConfig(),
                          path: str | None = None) -> dists.DISTSWeights:
    """α/β perceptual weights: explicit path, env, or the bundled asset."""
    path = path or os.environ.get(ENV_DISTS)
    if path and _is_torch(path):
        import torch

        from nerf_qa_tpu.compat.torch_weights import convert_alpha_beta

        raw = convert_alpha_beta(
            torch.load(path, map_location="cpu", weights_only=False)
        )
        return dists.weights_from_arrays(raw["alpha"], raw["beta"], cfg)
    return dists.load_pretrained_weights(cfg, path)


def resolve_vit_params(path: str | None = None, depth: int = 12,
                       grid_size: int = 16):
    """DINOv2 ViT params (None -> NRModel random-inits with a warning)."""
    path = path or os.environ.get(ENV_VIT)
    if path:
        from nerf_qa_tpu.compat.torch_vit import load_dinov2_from_torch_file

        return load_dinov2_from_torch_file(path, depth=depth,
                                           grid_size=grid_size)
    _warn(
        "no DINOv2 checkpoint (--vit-ckpt / $" + ENV_VIT + ") — the NR "
        "semantic encoder uses RANDOM weights."
    )
    return None


def resolve_lpips_weights(path: str | None = None):
    """LPIPS learned ``lin`` weights (eval.iqa.lpips); None -> uniform
    1/C fallback inside lpips() with a warning here."""
    path = path or os.environ.get(ENV_LPIPS)
    if path:
        import torch

        from nerf_qa_tpu.compat.torch_weights import convert_lpips_lin

        return convert_lpips_lin(
            torch.load(path, map_location="cpu", weights_only=False))
    _warn(
        "no LPIPS checkpoint (--lpips-ckpt / $" + ENV_LPIPS + ") — LPIPS "
        "uses uniform channel weights (uncalibrated)."
    )
    return None


def resolve_stlpips_weights(path: str | None = None):
    """ST-LPIPS learned ``lin`` weights (eval.iqa.st_lpips). The
    official ShiftTolerant-LPIPS vgg checkpoint stores its lin layers in
    the same layout as LPIPS, so the converter is shared; None ->
    uniform 1/C fallback inside st_lpips() with a warning here."""
    path = path or os.environ.get(ENV_STLPIPS)
    if path:
        import torch

        from nerf_qa_tpu.compat.torch_weights import convert_lpips_lin

        return convert_lpips_lin(
            torch.load(path, map_location="cpu", weights_only=False))
    _warn(
        "no ST-LPIPS checkpoint (--stlpips-ckpt / $" + ENV_STLPIPS + ") "
        "— ST-LPIPS uses uniform channel weights (uncalibrated)."
    )
    return None


def resolve_jbu_params(path: str | None = None):
    """FeatUp JBU upsampler params (None -> random init with a warning)."""
    path = path or os.environ.get(ENV_JBU)
    if path:
        from nerf_qa_tpu.compat.torch_featup import load_featup_from_torch_file

        return load_featup_from_torch_file(path)
    _warn(
        "no FeatUp checkpoint (--jbu-ckpt / $" + ENV_JBU + ") — the JBU "
        "semantic pyramid uses RANDOM weights."
    )
    return None
