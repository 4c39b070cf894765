"""One-shot asset conversion: reference weights.pt -> bundled npz.

Usage: python -m nerf_qa_tpu.compat.convert_assets [weights.pt path]
"""
from __future__ import annotations

import os
import sys

import numpy as np

from nerf_qa_tpu.compat.torch_weights import convert_alpha_beta

DEFAULT_SRC = "/root/reference/nerf_qa/DISTS_pytorch/weights.pt"
DEFAULT_DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "dists_alpha_beta.npz",
)


def main(src: str = DEFAULT_SRC, dst: str = DEFAULT_DST) -> None:
    import torch

    weights = torch.load(src, map_location="cpu", weights_only=False)
    out = convert_alpha_beta(weights)
    np.savez(dst, **out)
    print(f"wrote {dst}: alpha {out['alpha'].shape} beta {out['beta'].shape}")


if __name__ == "__main__":
    main(*sys.argv[1:])
