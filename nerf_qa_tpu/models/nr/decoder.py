"""RefineUp decoder: predicts ground-truth DISTS features from render
features + semantic context, coarse -> fine.

One parameterized module covers all eight reference generations
(SURVEY §2 #9-16):

* v1/v2 (model_nr.py / model_nr_v2.py): zero-seeded cascade, BatchNorm+
  ReLU blocks, front-slice feature integration, residual predictions
  off the render's own features; v2 drops the trailing semantic channels.
* v3 (model_nr_v3.py): + 1-channel score-regression head on the 16² mix
  and a learned RefineDown re-encoding cascade through the frozen VGG
  stages (:65-93, :256-267).
* v4 (model_nr_v4.py:179-224): decoder OFF — pure score regression.
* v5 (model_nr_v5.py): decoder + 2-channel head (dists residual,
  spatial MAE map) on the final full-res feature map.
* v6 (model_nr_v6.py): 6-entry channel schedule (drops the duplicate 512
  head), always-resample layers, per-scale bilinear-upsampled
  trans_decode injection (:67-83), 4-channel calibrated head (:188-203).
* v7/v8 (model_nr_v7.py / model_nr_v8.py): ChannelNorm+GELU, per-scale
  JBU semantic-pyramid injection, refine_scale2-residual blocks, no
  auxiliary head.

TPU notes: the reference's in-place channel-slice adds
(``input_feats[:, :c] += ...``, model_nr.py:76) become functional
concat-of-slices; everything is NHWC.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from nerf_qa_tpu.config import NRModelConfig
from nerf_qa_tpu.core.vgg import vgg_stage_apply
from nerf_qa_tpu.models.nr.layers import (
    ConvLayer,
    ConvTransposeLayer,
    TransformerBlock,
)
from nerf_qa_tpu.ops.resize import resize_bilinear

DISTS_CHNS: tuple[int, ...] = (3, 64, 128, 256, 512, 512)


def version_schedules(version: int, sem_dim: int) -> tuple[list, list]:
    """Per-generation (dists, sem) channel schedules.

    v1-v5 prepend a duplicate 512 head (model_nr.py:150-151 ``[dim] +
    reversed(chns)``); v6 drops it (model_nr_v6.py:156); the semantic
    width shrinks toward fine scales for v1-v6 and stays full-width for
    v7/v8 (model_nr_v8.py:184 ``[dim] * 6``)."""
    rev = list(reversed(DISTS_CHNS))  # [512,512,256,128,64,3]
    if version >= 7:
        return rev, [sem_dim] * 6
    if version == 6:
        return rev, [sem_dim, sem_dim, sem_dim // 2, sem_dim // 4,
                     sem_dim // 8, sem_dim // 16]
    tail = sem_dim // 16 if version in (1, 5) else 0  # v2/v3/v4: 0
    return [DISTS_CHNS[-1]] + rev, [
        sem_dim, sem_dim, sem_dim, sem_dim // 2, sem_dim // 4,
        sem_dim // 8, tail,
    ]


def _front_add(x: jax.Array, y: jax.Array, chns: int) -> jax.Array:
    """Functional ``x[..., :chns] += y[..., :chns]`` (model_nr.py:76)."""
    return jnp.concatenate([x[..., :chns] + y[..., :chns], x[..., chns:]],
                           axis=-1)


class RefineUp(nn.Module):
    """One refine(+upsample) stage, v7/v8 semantics (model_nr_v8.py:53-104:
    blend input with [dists_feat, sem_feat], conv block with refine_scale2
    residual, slice off the predicted DISTS channels, resample)."""

    output_chns: int
    feature_chns: int  # predicted-DISTS channel count sliced off the front
    depth: int = 2
    upsample: bool = True
    dropout_rate: float = 0.0
    norm_type: str = "channel"
    refine_scale1: float = 1.0
    refine_scale2: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_feats, dists_feat, sem_feat,
                 deterministic: bool = True):
        input_chns = input_feats.shape[-1]
        x = input_feats * self.refine_scale1 + jnp.concatenate(
            [dists_feat, sem_feat], axis=-1
        )
        x = x.astype(self.dtype)
        h = x
        if self.depth >= 2:
            for _ in range(self.depth - 1):
                h = ConvLayer(input_chns, activation=True,
                              dropout_rate=self.dropout_rate,
                              norm_type=self.norm_type,
                              dtype=self.dtype)(h, deterministic)
            h = ConvLayer(input_chns, activation=False,
                          dropout_rate=self.dropout_rate,
                          norm_type=self.norm_type,
                          dtype=self.dtype)(h, deterministic)
        else:
            for _ in range(self.depth):
                h = ConvLayer(input_chns, activation=False,
                              dropout_rate=self.dropout_rate,
                              norm_type=self.norm_type,
                              dtype=self.dtype)(h, deterministic)
        feature_map = self.refine_scale2 * h + x
        pred_feats = feature_map[..., : self.feature_chns]
        if self.upsample:
            feature_map = ConvTransposeLayer(
                self.output_chns, activation=False,
                dropout_rate=self.dropout_rate, norm_type=self.norm_type,
                dtype=self.dtype,
            )(feature_map, deterministic)
        else:
            feature_map = ConvLayer(
                self.output_chns, activation=False,
                dropout_rate=self.dropout_rate, norm_type=self.norm_type,
                dtype=self.dtype,
            )(feature_map, deterministic)
        return feature_map, pred_feats


class RefineUpLegacy(nn.Module):
    """v1-v6 refine stage (model_nr.py:33-88, model_nr_v6.py:50-95):
    front-slice integration of the render feature, BatchNorm+ReLU block,
    prediction = refine_scale2 * block_out[:fc] + render_feat[:fc]
    (a residual off the render's own feature), raw ConvTranspose 2x.

    block_to_out: v1-v5 map in->out inside the block and only upsample
    when upsampling; v6 keeps the block at in->in and ALWAYS resamples
    through a transposed conv / conv (model_nr_v6.py:57-64,92).
    trans_inject: v6's per-scale bilinear-upsampled (align_corners=True)
    transformer-context injection into the trailing semantic channels
    (model_nr_v6.py:80-83)."""

    output_chns: int
    feature_chns: int
    depth: int = 2
    upsample: bool = True
    block_to_out: bool = True
    always_resample: bool = False
    trans_inject: bool = False
    dropout_rate: float = 0.0
    refine_scale1: float = 1.0
    refine_scale2: float = 0.1

    @nn.compact
    def __call__(self, input_feats, dists_feat, trans_decode,
                 deterministic: bool = True):
        in_ch = input_feats.shape[-1]
        fc = self.feature_chns
        x = _front_add(input_feats * self.refine_scale1, dists_feat, fc)
        if self.trans_inject:
            s = in_ch - fc
            if s > 0:
                h, w = x.shape[1:3]
                up = resize_bilinear(trans_decode[..., -s:], h, w,
                                     align_corners=True)
                x = jnp.concatenate([x[..., :fc], x[..., fc:] + up], axis=-1)
        h = x
        for _ in range(self.depth - 1):
            h = ConvLayer(in_ch, activation=True,
                          dropout_rate=self.dropout_rate,
                          norm_type="batch")(h, deterministic)
        h = ConvLayer(self.output_chns if self.block_to_out else in_ch,
                      activation=False, dropout_rate=self.dropout_rate,
                      norm_type="batch")(h, deterministic)
        pred = self.refine_scale2 * h[..., :fc] + dists_feat[..., :fc]
        if self.upsample:
            # raw transposed conv (reference uses bare nn.ConvTranspose2d
            # k3 s2 p1 outp1, model_nr.py:59-61 / model_nr_v6.py:62);
            # padding ((1,2),(1,2)) is torch's exact output alignment.
            # Sub-pixel path is opt-in — measured slower (layers.py).
            from nerf_qa_tpu.models.nr.layers import (
                SubpixelConvTranspose,
                _subpixel_ct_enabled,
            )

            if _subpixel_ct_enabled():
                h = SubpixelConvTranspose(self.output_chns,
                                          name="ConvTranspose_0")(h)
            else:
                h = nn.ConvTranspose(self.output_chns, (3, 3),
                                     strides=(2, 2),
                                     padding=((1, 2), (1, 2)))(h)
        elif self.always_resample:
            h = ConvLayer(self.output_chns, activation=False,
                          dropout_rate=self.dropout_rate,
                          norm_type="batch")(h, deterministic)
        return h, pred


class RefineDown(nn.Module):
    """v3 re-encoding stage (model_nr_v3.py:65-93): the running feature
    map's leading channels are pushed through the actual frozen VGG stage
    (``stage_out``, computed by the caller with vgg_stage_apply), the map
    is blended with the up-cascade's prediction at that level, optionally
    stride-2 downsampled, conv-refined, and the re-encoded prediction is
    stage_out + refine_scale * refinement.

    The checked-in reference adds ``input_feats + additional_feats`` with
    mismatched channel counts past the first layer; per the codebase's own
    front-slice idiom (model_nr.py:76) the add is applied over the leading
    shared channels here."""

    output_chns: int
    depth: int = 2
    downsample: bool = True
    dropout_rate: float = 0.0
    refine_scale: float = 0.1

    @nn.compact
    def __call__(self, input_feats, additional_feats, stage_out,
                 deterministic: bool = True):
        in_ch = input_feats.shape[-1]
        shared = min(in_ch, additional_feats.shape[-1])
        x = _front_add(input_feats, additional_feats, shared)
        if self.downsample:
            # raw stride-2 conv (model_nr_v3.py:62 bare nn.Conv2d)
            x = nn.Conv(in_ch, (3, 3), strides=(2, 2), padding="SAME")(x)
        h = x
        for _ in range(self.depth - 1):
            h = ConvLayer(in_ch, activation=True,
                          dropout_rate=self.dropout_rate,
                          norm_type="batch")(h, deterministic)
        h = ConvLayer(self.output_chns, activation=False,
                      dropout_rate=self.dropout_rate,
                      norm_type="batch")(h, deterministic)
        oc = stage_out.shape[-1]
        pred = self.refine_scale * h[..., :oc] + stage_out
        return h, pred


class ScoreRegHead(nn.Module):
    """Auxiliary score-regression head: two ConvLayers (second without
    activation), returning the raw (N, H, W, k) map — the model pools and
    calibrates (v3/v4: ConvLayer(mix, sem)+ConvLayer(sem, 1),
    model_nr_v3.py:229-232; v5/v6: ConvLayer(last, last)+ConvLayer(last, k),
    model_nr_v6.py:167-170)."""

    channels: int
    hidden: int
    dropout_rate: float = 0.0
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, mixed, deterministic: bool = True):
        h = ConvLayer(self.hidden, activation=True,
                      dropout_rate=self.dropout_rate,
                      norm_type=self.norm_type)(mixed, deterministic)
        return ConvLayer(self.channels, activation=False,
                         dropout_rate=self.dropout_rate,
                         norm_type=self.norm_type)(h, deterministic)


class NRDecoder(nn.Module):
    """Transformer context mixer + RefineUp cascade
    (model_nr_v8.py:190-236 and the per-version variants above).

    Inputs (all NHWC):
      dists_feats: the 6-level render DISTS pyramid [x, s1..s5]
      sem_feats: low-res semantic map (N, gh, gw, D)
      sem_pyramid: 6-level upsampled semantic pyramid (v7/v8 only; pass
        an empty list for v1-v6)
      vgg_params: frozen VGG pyramid params (v3's RefineDown only)
    Returns (predicted, score_reg_map) — predicted GT DISTS features in
    [x, s1..s5] order (None for v4), score_reg_map (N, H, W, k) or None.
    """

    cfg: NRModelConfig
    dists_chns: Sequence[int] = DISTS_CHNS
    sem_dim: int = 384

    def _dtype(self):
        return (jnp.bfloat16 if self.cfg.decoder_dtype == "bfloat16"
                else jnp.float32)

    @nn.compact
    def __call__(self, dists_feats, sem_feats, sem_pyramid,
                 deterministic: bool = True, vgg_params=None):
        cfg = self.cfg
        v = cfg.version
        d_chns, s_chns = version_schedules(v, self.sem_dim)
        top = dists_feats[-1]  # (N, gh, gw, 512)
        n, gh, gw, dists_dim = top.shape
        mix_dim = dists_dim + self.sem_dim

        # transformer context mixer (all versions share the structure;
        # v1-v5 use unit scales, v6/v8 refine_scale3/4 —
        # model_nr_v8.py:220-226)
        if cfg.transformer_decoder_depth > 0:
            encoder_feats = jnp.concatenate([top, sem_feats], axis=-1)
            tokens = encoder_feats.reshape(n, gh * gw, mix_dim)
            for i in range(cfg.transformer_decoder_depth):
                tokens = TransformerBlock(mix_dim, 8, dtype=self._dtype(),
                                          name=f"trans{i}")(tokens)
            trans_decode = tokens.reshape(n, gh, gw, mix_dim)
            mixed = ConvLayer(
                self.sem_dim, activation=True, norm_type=cfg.norm_type,
                dropout_rate=cfg.dropout_rate, dtype=self._dtype(),
                name="trans2sem",
            )(encoder_feats + cfg.refine_scale3 * trans_decode, deterministic)
            mixed = mixed.astype(jnp.float32)
            trans_decode = sem_feats + cfg.refine_scale4 * mixed
        else:
            trans_decode = sem_feats

        reg_channels = cfg.reg_channels
        score_reg = None
        if v == 4:
            # decoder-off pure regression (model_nr_v4.py:179-224): the
            # head on the 16² [dists top | semantic] mix IS the model
            mix = jnp.concatenate(
                [top, trans_decode if cfg.transformer_decoder_depth > 0
                 else sem_feats], axis=-1)
            score_reg = ScoreRegHead(
                max(reg_channels, 1), self.sem_dim, cfg.dropout_rate,
                "batch", name="score_reg",
            )(mix, deterministic)
            return None, score_reg
        if reg_channels > 0 and (v == 3 or v >= 7):
            # 16²-mix head (v3 uses the RAW semantic features,
            # model_nr_v3.py:272-275; the v7/v8 head is a repo extension)
            mix = jnp.concatenate(
                [top, sem_feats if v == 3 else trans_decode], axis=-1)
            score_reg = ScoreRegHead(
                reg_channels, self.sem_dim, cfg.dropout_rate,
                cfg.norm_type, name="score_reg",
            )(mix, deterministic)

        if v >= 7:
            feature_map, predicted = self._cascade_v8(
                dists_feats, sem_pyramid, trans_decode, deterministic)
        else:
            feature_map, predicted = self._cascade_legacy(
                dists_feats, trans_decode, deterministic, d_chns, s_chns)
            if v == 3:
                predicted = self._refine_down(
                    feature_map, predicted, vgg_params, d_chns, s_chns,
                    deterministic)
        if reg_channels > 0 and v in (5, 6):
            # final-feature-map head at full resolution
            # (model_nr_v5.py:163-166 / model_nr_v6.py:167-170)
            last_chns = d_chns[-1] + s_chns[-1]
            score_reg = ScoreRegHead(
                reg_channels, last_chns, cfg.dropout_rate, "batch",
                name="score_reg",
            )(feature_map, deterministic)
        return predicted, score_reg

    def _cascade_v8(self, dists_feats, sem_pyramid, trans_decode,
                    deterministic):
        cfg = self.cfg
        rev_chns = list(reversed(self.dists_chns))  # [512,512,256,128,64,3]
        feature_map = jnp.concatenate([dists_feats[-1], trans_decode],
                                      axis=-1)
        num_upscales = len(rev_chns) - 2
        # remat: recompute each stage's activations in the backward pass
        # (deterministic is arg 4 counting self — a static python bool)
        refine_cls = (nn.remat(RefineUp, static_argnums=(4,))
                      if cfg.remat else RefineUp)
        predicted = []
        for i in range(num_upscales + 2):
            out_dists = (rev_chns[i + 1] if i < len(rev_chns) - 1
                         else rev_chns[i])
            feature_map, pred = refine_cls(
                output_chns=out_dists + self.sem_dim,
                feature_chns=rev_chns[i],
                depth=cfg.refine_up_depth,
                upsample=i < num_upscales,
                dropout_rate=cfg.dropout_rate,
                norm_type=cfg.norm_type,
                refine_scale1=cfg.refine_scale1,
                refine_scale2=cfg.refine_scale2,
                dtype=self._dtype(),
                name=f"refine{i}",
            )(
                feature_map,
                dists_feats[len(dists_feats) - 1 - i],
                sem_pyramid[i],
                deterministic,
            )
            predicted.append(pred)
        return feature_map, list(reversed(predicted))

    def _cascade_legacy(self, dists_feats, trans_decode, deterministic,
                        d_chns, s_chns):
        """v1-v6 cascade: zero-seeded feature map (model_nr.py:182
        ``concat([zeros_like(top), trans_decode])``; v6 zeros BOTH parts,
        model_nr_v6.py:216), front-slice integration, residual
        predictions."""
        cfg = self.cfg
        v = cfg.version
        top = dists_feats[-1]
        seed_sem = (jnp.zeros_like(trans_decode) if v == 6
                    else trans_decode)
        feature_map = jnp.concatenate(
            [jnp.zeros_like(top), seed_sem], axis=-1)
        num_upscales = len(d_chns) - (3 if v <= 5 else 2)
        n_layers = num_upscales + 2
        predicted = []
        for i in range(n_layers):
            if v <= 5:
                fc = d_chns[i + 1]
                out_ch = d_chns[i + 1] + s_chns[i + 1]
            else:
                fc = d_chns[i]
                last = i >= len(d_chns) - 1
                out_ch = (d_chns[i] + s_chns[i] if last
                          else d_chns[i + 1] + s_chns[i + 1])
            feature_map, pred = RefineUpLegacy(
                output_chns=out_ch,
                feature_chns=fc,
                depth=cfg.refine_up_depth,
                upsample=i < num_upscales,
                block_to_out=v <= 5,
                always_resample=v == 6,
                trans_inject=v == 6,
                dropout_rate=cfg.dropout_rate,
                refine_scale1=cfg.refine_scale1,
                refine_scale2=cfg.refine_scale2,
                name=f"refine{i}",
            )(
                feature_map,
                dists_feats[len(dists_feats) - 1 - i],
                trans_decode,
                deterministic,
            )
            predicted.append(pred)
        return feature_map, list(reversed(predicted))

    def _refine_down(self, feature_map, predicted, vgg_params, d_chns,
                     s_chns, deterministic):
        """v3 re-encoding cascade (model_nr_v3.py:256-267,289-301): the
        predicted image is ImageNet-normalized and the up-cascade's
        predictions are re-encoded through the frozen VGG stages via
        RefineDown layers."""
        from nerf_qa_tpu.core.vgg import IMAGENET_MEAN, IMAGENET_STD

        if vgg_params is None:
            raise ValueError("NR v3 RefineDown needs vgg_params")
        cfg = self.cfg
        img = (predicted[0] - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
            IMAGENET_STD
        )
        # reversed(stack) with the normalized image first: [img, s1..s5]
        additionals = [img] + predicted[1:]
        new_predicted = [img]
        fm = feature_map
        num_upscales = len(d_chns) - 3
        # reference indices i = 5..1 -> stages 1..5; downsample for i<=4
        for k in range(5):
            ref_i = 5 - k
            fc = d_chns[ref_i + 1]
            out_ch = d_chns[ref_i] + s_chns[ref_i]
            stage_out = vgg_stage_apply(vgg_params, k + 1, fm[..., :fc])
            fm, pred = RefineDown(
                output_chns=out_ch,
                depth=cfg.refine_up_depth,
                downsample=ref_i <= num_upscales,
                dropout_rate=cfg.dropout_rate,
                refine_scale=cfg.refine_scale2,
                name=f"refine_down{k}",
            )(fm, additionals[k], stage_out, deterministic)
            new_predicted.append(pred)
        return new_predicted
