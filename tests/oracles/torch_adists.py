"""Functional torch oracle for ADISTS parity tests.

Compact functional re-expression of the reference equations
(nerf_qa/ADISTS/ADISTS.py) operating on injected VGG params, so JAX
numerics can be checked with identical weights. NCHW torch layout.
"""
import math

import numpy as np
import torch
import torch.nn.functional as F

from tests.oracles.torch_dists import vgg_pyramid_torch

C0 = 1e-12


def gauss_window(k=21, sigma=None, channels=1):
    sigma = sigma or k / 3
    g = torch.tensor([math.exp(-((x - k // 2) ** 2) / (2 * sigma**2)) for x in range(k)])
    g = (g / g.sum()).float()
    w2 = torch.outer(g, g)[None, None]
    return w2.expand(channels, 1, k, k).contiguous()


def wconv(x, k=21):
    c = x.shape[1]
    return F.conv2d(x, gauss_window(k, channels=c), stride=1, padding=0, groups=c)


def compute_prob_torch(feats, k=21):
    ps_list = []
    ps_prod = torch.ones_like(feats[0][:, 0:1])
    for i in range(len(feats) - 1, -1, -1):
        f = feats[i]
        if f.shape[2] >= k and f.shape[3] >= k:
            xm = wconv(f, k)
            xv = wconv(f**2, k) - xm**2
            h, w = xm.shape[2], xm.shape[3]
            gamma = torch.mean(xv / (xm + C0), dim=1, keepdim=True)
            ps = torch.sigmoid(
                (gamma - gamma.mean(dim=(2, 3), keepdim=True))
                / (gamma.std(dim=(2, 3), keepdim=True, unbiased=True) + C0)
            )
            mn = ps.flatten(2).min(-1, keepdim=True)[0].unsqueeze(-1)
            mx = ps.flatten(2).max(-1, keepdim=True)[0].unsqueeze(-1)
            ps = (ps - mn) / (mx - mn + C0)
            ps_prod = ps * F.interpolate(ps_prod, size=(h, w), mode="bilinear",
                                         align_corners=True)
            mn = ps_prod.flatten(2).min(-1, keepdim=True)[0].unsqueeze(-1)
            mx = ps_prod.flatten(2).max(-1, keepdim=True)[0].unsqueeze(-1)
            ps_prod = (ps_prod - mn) / (mx - mn + C0)
        else:
            xm = f.mean((2, 3), keepdim=True)
            xv = ((f - xm) ** 2).mean((2, 3), keepdim=True)
            gamma = torch.mean(xv / (xm + C0), dim=1, keepdim=True)
            ps = torch.sigmoid(gamma)
            ps_prod = ps * F.interpolate(ps_prod, size=(1, 1), mode="bilinear",
                                         align_corners=True)
        ps_list.append(ps_prod)
    return ps_list[::-1]


def entropy_torch(f):
    b, c, h, w = f.shape
    f = F.normalize(F.relu(f), dim=(2, 3))
    f = f.reshape(b, c, -1)
    f = f / (f.sum(2, keepdim=True) + C0)
    w_ = torch.sum(-f * torch.log2(f + C0), dim=2, keepdim=True)
    w_ = w_ / (w_.sum(1, keepdim=True) + C0)
    return w_ * c


def adists_torch(params_nhwc, x, y, k=21, as_loss=False):
    feats_x = vgg_pyramid_torch(params_nhwc, x)
    feats_y = vgg_pyramid_torch(params_nhwc, y)
    chns = [f.shape[1] for f in feats_x]
    ps_x = compute_prob_torch(feats_x, k)

    weight = torch.concat([entropy_torch(f) for f in feats_x], dim=1)
    weight = weight / weight.sum(dim=(1, 2), keepdim=True)
    wm = weight.mean(dim=(1, 2), keepdim=True)
    ws = torch.sqrt(((weight - wm) ** 2).mean(dim=(1, 2), keepdim=True))
    weight = weight.clamp(min=wm - 0.5 * ws, max=wm + 0.5 * ws)
    weight = weight / weight.sum(dim=(1, 2), keepdim=True)
    weight_list = torch.split(weight, chns, dim=1)

    d = 0
    for i in range(len(chns) - 1, -1, -1):
        fx = F.normalize(feats_x[i], dim=(2, 3))
        fy = F.normalize(feats_y[i], dim=(2, 3))
        if fx.shape[2] >= k and fx.shape[3] >= k:
            xm, ym = wconv(fx, k), wconv(fy, k)
            xv = wconv(fx**2, k) - xm**2
            yv = wconv(fy**2, k) - ym**2
            cov = wconv(fx * fy, k) - xm * ym
        else:
            xm = fx.mean((2, 3), keepdim=True)
            ym = fy.mean((2, 3), keepdim=True)
            xv = ((fx - xm) ** 2).mean((2, 3), keepdim=True)
            yv = ((fy - ym) ** 2).mean((2, 3), keepdim=True)
            cov = (fx * fy).mean((2, 3), keepdim=True) - xm * ym
        t = (2 * xm * ym + 1e-6) / (xm**2 + ym**2 + 1e-6)
        s = (2 * cov + 1e-6) / (xv + yv + 1e-6)
        ps = ps_x[i].expand(t.shape[0], t.shape[1], -1, -1)
        pt = 1 - ps
        d_map = ((pt * t + ps * s) * weight_list[i].unsqueeze(3)).sum(1, keepdim=True)
        d = d + d_map.mean((2, 3)).sum(1)
    return (1 - d.mean()) if as_loss else (1 - d)
