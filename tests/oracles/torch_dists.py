"""Functional torch oracle for DISTS parity tests.

Re-expresses the reference equations (nerf_qa/DISTS_pytorch/DISTS_pt.py)
in a compact functional style so the JAX implementation can be compared
bit-for-bit against torch numerics *with identical injected weights*
(torchvision's pretrained checkpoint is unavailable in this environment,
so parity is established on the computation, not on a fixed asset).

NCHW here (torch-native); the framework under test is NHWC.
"""
import numpy as np
import torch
import torch.nn.functional as F

CHNS = [3, 64, 128, 256, 512, 512]
_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def l2pool_torch(x: torch.Tensor) -> torch.Tensor:
    a = torch.from_numpy(np.hanning(5)[1:-1].copy()).float()
    g = torch.outer(a, a)
    g = g / g.sum()
    c = x.shape[1]
    filt = g.expand(c, 1, 3, 3)
    out = F.conv2d(x**2, filt, stride=2, padding=1, groups=c)
    return torch.sqrt(out + 1e-12)


def vgg_pyramid_torch(params_nhwc, x: torch.Tensor) -> list[torch.Tensor]:
    """params_nhwc: the JAX-side pyramid params (HWIO numpy arrays)."""
    feats = [x]
    h = (x - _MEAN) / _STD
    for si in range(5):
        if si > 0:
            h = l2pool_torch(h)
        for layer in params_nhwc[f"stage{si + 1}"]:
            w = torch.from_numpy(
                np.transpose(np.asarray(layer["kernel"]), (3, 2, 0, 1)).copy()
            )
            b = torch.from_numpy(np.asarray(layer["bias"]).copy())
            h = F.relu(F.conv2d(h, w, b, padding=1))
        feats.append(h)
    return feats


def dists_score_torch(alpha: np.ndarray, beta: np.ndarray,
                      feats0, feats1) -> torch.Tensor:
    a = torch.from_numpy(np.asarray(alpha).reshape(1, -1, 1, 1).copy())
    b = torch.from_numpy(np.asarray(beta).reshape(1, -1, 1, 1).copy())
    w_sum = a.sum() + b.sum()
    a_split = torch.split(a / w_sum, CHNS, dim=1)
    b_split = torch.split(b / w_sum, CHNS, dim=1)
    c1 = c2 = 1e-6
    dist1 = 0
    dist2 = 0
    for k in range(len(CHNS)):
        xm = feats0[k].mean([2, 3], keepdim=True)
        ym = feats1[k].mean([2, 3], keepdim=True)
        s1 = (2 * xm * ym + c1) / (xm**2 + ym**2 + c1)
        dist1 = dist1 + (a_split[k] * s1).sum(1, keepdim=True)
        xv = ((feats0[k] - xm) ** 2).mean([2, 3], keepdim=True)
        yv = ((feats1[k] - ym) ** 2).mean([2, 3], keepdim=True)
        cov = (feats0[k] * feats1[k]).mean([2, 3], keepdim=True) - xm * ym
        s2 = (2 * cov + c2) / (xv + yv + c2)
        dist2 = dist2 + (b_split[k] * s2).sum(1, keepdim=True)
    return 1 - (dist1 + dist2).squeeze(3).squeeze(2).squeeze(1)


def dists_full_torch(params_nhwc, alpha, beta, x, y) -> torch.Tensor:
    f0 = vgg_pyramid_torch(params_nhwc, x)
    f1 = vgg_pyramid_torch(params_nhwc, y)
    return dists_score_torch(alpha, beta, f0, f1)
