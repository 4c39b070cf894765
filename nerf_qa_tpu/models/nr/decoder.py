"""RefineUp decoder: predicts ground-truth DISTS features from render
features + semantic context, coarse -> fine.

Reference behavior: model_nr_v8.py:53-104 (RefineUp: blend input with
[dists_feat, sem_feat], conv block with refine_scale2 residual, slice off
the predicted DISTS channels, optionally 2x-upsample) and :198-236 (the
6-layer cascade over reversed pyramid channels with per-scale semantic
injection). Earlier generations (model_nr.py .. model_nr_v7.py) differ in
norm type (BatchNorm+ReLU vs ChannelNorm+GELU), channel schedules,
residual scales and auxiliary heads — expressed here as config knobs of
ONE module (SURVEY §2 #9-16; §7.2 step 7).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from nerf_qa_tpu.config import NRModelConfig
from nerf_qa_tpu.models.nr.layers import (
    ConvLayer,
    ConvTransposeLayer,
    TransformerBlock,
)


class RefineUp(nn.Module):
    """One refine(+upsample) stage (model_nr_v8.py:53-104)."""

    output_chns: int
    feature_chns: int  # predicted-DISTS channel count sliced off the front
    depth: int = 2
    upsample: bool = True
    dropout_rate: float = 0.0
    norm_type: str = "channel"
    refine_scale1: float = 1.0
    refine_scale2: float = 0.1

    @nn.compact
    def __call__(self, input_feats, dists_feat, sem_feat,
                 deterministic: bool = True):
        input_chns = input_feats.shape[-1]
        x = input_feats * self.refine_scale1 + jnp.concatenate(
            [dists_feat, sem_feat], axis=-1
        )
        h = x
        if self.depth >= 2:
            for _ in range(self.depth - 1):
                h = ConvLayer(input_chns, activation=True,
                              dropout_rate=self.dropout_rate,
                              norm_type=self.norm_type)(h, deterministic)
            h = ConvLayer(input_chns, activation=False,
                          dropout_rate=self.dropout_rate,
                          norm_type=self.norm_type)(h, deterministic)
        else:
            for _ in range(self.depth):
                h = ConvLayer(input_chns, activation=False,
                              dropout_rate=self.dropout_rate,
                              norm_type=self.norm_type)(h, deterministic)
        feature_map = self.refine_scale2 * h + x
        pred_feats = feature_map[..., : self.feature_chns]
        if self.upsample:
            feature_map = ConvTransposeLayer(
                self.output_chns, activation=False,
                dropout_rate=self.dropout_rate, norm_type=self.norm_type,
            )(feature_map, deterministic)
        else:
            feature_map = ConvLayer(
                self.output_chns, activation=False,
                dropout_rate=self.dropout_rate, norm_type=self.norm_type,
            )(feature_map, deterministic)
        return feature_map, pred_feats


class ScoreRegHead(nn.Module):
    """Auxiliary score-regression head (v3-v6 generations).

    Conv stack over the 16² mixed (DISTS top + semantic) features,
    spatially mean-pooled to k channels (model_nr_v4.py:179-188,
    model_nr_v6.py:188-203). Channel meanings by k: [score_residual,
    mae_map, pred_std, pred_mean]; ``reg_activation`` calibrates the
    std/mean outputs (v6: linear/relu/sigmoid).
    """

    channels: int
    dropout_rate: float = 0.0
    norm_type: str = "channel"

    @nn.compact
    def __call__(self, mixed, deterministic: bool = True):
        h = ConvLayer(mixed.shape[-1] // 2, activation=True,
                      dropout_rate=self.dropout_rate,
                      norm_type=self.norm_type)(mixed, deterministic)
        h = nn.Conv(self.channels, (3, 3), padding="SAME")(h)
        return h.mean(axis=(1, 2))  # (N, channels)


class NRDecoder(nn.Module):
    """Transformer context mixer + RefineUp cascade
    (model_nr_v8.py:190-236).

    Inputs (all NHWC):
      dists_feats: the 6-level render DISTS pyramid [x, s1..s5]
      sem_feats: low-res semantic map (N, 16, 16, D)
      sem_pyramid: 6-level upsampled semantic pyramid matching reversed
        DISTS spatial sizes
    Returns predicted GT DISTS features in [x, s1..s5] order.
    """

    cfg: NRModelConfig
    dists_chns: Sequence[int] = (3, 64, 128, 256, 512, 512)
    sem_dim: int = 384

    @nn.compact
    def __call__(self, dists_feats, sem_feats, sem_pyramid,
                 deterministic: bool = True):
        cfg = self.cfg
        rev_chns = list(reversed(self.dists_chns))  # [512,512,256,128,64,3]
        top = dists_feats[-1]  # (N, 16, 16, 512)
        n, gh, gw, dists_dim = top.shape
        mix_dim = dists_dim + self.sem_dim

        if cfg.transformer_decoder_depth > 0:
            encoder_feats = jnp.concatenate([top, sem_feats], axis=-1)
            tokens = encoder_feats.reshape(n, gh * gw, mix_dim)
            for i in range(cfg.transformer_decoder_depth):
                tokens = TransformerBlock(mix_dim, 8, name=f"trans{i}")(tokens)
            trans_decode = tokens.reshape(n, gh, gw, mix_dim)
            mixed = ConvLayer(
                self.sem_dim, activation=True,
                dropout_rate=cfg.dropout_rate, name="trans2sem",
            )(encoder_feats + cfg.refine_scale3 * trans_decode, deterministic)
            trans_decode = sem_feats + cfg.refine_scale4 * mixed
        else:
            trans_decode = sem_feats

        feature_map = jnp.concatenate([top, trans_decode], axis=-1)
        score_reg = None
        if cfg.score_reg_channels > 0:
            score_reg = ScoreRegHead(
                cfg.score_reg_channels, cfg.dropout_rate,
                "channel" if cfg.version >= 7 else "batch",
                name="score_reg",
            )(feature_map, deterministic)
        num_upscales = len(rev_chns) - 2
        predicted = []
        for i in range(num_upscales + 2):
            out_dists = rev_chns[i + 1] if i < len(rev_chns) - 1 else rev_chns[i]
            refiner = RefineUp(
                output_chns=out_dists + self.sem_dim,
                feature_chns=rev_chns[i],
                depth=cfg.refine_up_depth,
                upsample=i < num_upscales,
                dropout_rate=cfg.dropout_rate,
                norm_type="channel" if cfg.version >= 7 else "batch",
                refine_scale1=cfg.refine_scale1,
                refine_scale2=cfg.refine_scale2,
                name=f"refine{i}",
            )
            feature_map, pred = refiner(
                feature_map,
                dists_feats[len(dists_feats) - 1 - i],
                sem_pyramid[i],
                deterministic,
            )
            predicted.append(pred)
        if score_reg is not None:
            return list(reversed(predicted)), score_reg
        return list(reversed(predicted))
