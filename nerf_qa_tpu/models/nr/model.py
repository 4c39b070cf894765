"""No-reference quality model (flagship: v8 architecture).

Reference behavior: model_nr_v8.py:138-281 —
* Encoder (frozen): semantic ViT (+ JBU upsampler pyramid) on the 224²
  render, DISTS VGG pyramid on the 256² render (:156-166).
* Decoder (trainable): transformer context mixer + RefineUp cascade
  predicting the ground-truth DISTS feature pyramid (:217-236).
* Score: DISTS.forward_from_feats(render_feats, predicted_gt_feats)
  (:239-246).
* Losses (:250-274): l1(predicted_score, gt_dists_score) where
  gt_dists_score = DISTS(gt_feats, render_feats) — self-supervised — plus
  dists_pref2ref = DISTS(predicted_feats, gt_feats); combined by
  dists_pref2ref_coeff.

Versions v1-v7 are config points (NRModelConfig.version) of the same
decoder (SURVEY §2 #9-16): norm type switches at v7, channel schedules
and residual scales are config fields.

TPU design: encoder runs under stop_gradient (frozen), decoder is a flax
module; the whole train step jits into one program; batch axis shards
over the data mesh.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nerf_qa_tpu.config import NRModelConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.core.vgg import vgg16_pyramid
from nerf_qa_tpu.models.nr.decoder import NRDecoder
from nerf_qa_tpu.models.nr.featup import JBUStack
from nerf_qa_tpu.models.nr.vit import ViTS14


class EncoderFeats(NamedTuple):
    dists_feats: list  # 6-level render DISTS pyramid [x, s1..s5]
    sem_feats: jax.Array  # (N, 16, 16, D) low-res semantic map
    sem_pyramid: list  # 6-level upsampled semantic pyramid


class NRModel:
    """Bundles frozen encoder params + trainable decoder module.

    ``init`` returns only the trainable decoder params; encoder params are
    attributes (frozen, replicated at train time).
    """

    def __init__(
        self,
        vgg_params,
        dists_weights: dists.DISTSWeights | None = None,
        cfg: NRModelConfig = NRModelConfig(),
        vit_params=None,
        jbu_params=None,
        seed: int = 0,
        render_size: int = 256,
        sem_size: int = 224,
        vit: ViTS14 | None = None,
    ):
        # input resolutions; must satisfy render_size/16 == sem_size/14 so
        # the DISTS stage-5 grid matches the ViT patch grid
        # (model_nr_v8.py:161-164 picks 224 for dinov2, 256 otherwise)
        self.render_size = render_size
        self.sem_size = sem_size
        self.cfg = cfg
        self.vgg_params = vgg_params
        self.dists_weights = dists_weights or dists.load_pretrained_weights(cfg.dists)
        self.vit = vit if vit is not None else ViTS14()
        self.jbu = JBUStack(dim=self.vit.embed_dim)
        self.decoder = NRDecoder(cfg=cfg, sem_dim=self.vit.embed_dim)
        rng = jax.random.PRNGKey(seed)
        k_vit, k_jbu = jax.random.split(rng)
        grid = sem_size // self.vit.patch_size
        if vit_params is None:
            dummy = jnp.zeros((1, sem_size, sem_size, 3), jnp.float32)
            vit_params = self.vit.init(k_vit, dummy)["params"]
        if jbu_params is None:
            dummy_f = jnp.zeros((1, grid, grid, self.vit.embed_dim), jnp.float32)
            dummy_i = jnp.zeros((1, sem_size, sem_size, 3), jnp.float32)
            jbu_params = self.jbu.init(k_jbu, dummy_f, dummy_i)["params"]
        self.vit_params = vit_params
        self.jbu_params = jbu_params

    # -- encoder (frozen) --------------------------------------------------
    def encode(self, render_256: jax.Array, render_224: jax.Array) -> EncoderFeats:
        """Frozen feature extraction (model_nr_v8.py:156-166)."""
        compute_dtype = (
            jnp.bfloat16 if self.cfg.dists.compute_dtype == "bfloat16"
            else jnp.float32
        )
        sem_input = render_224 if self.cfg.vit_model == "dinov2" else render_256
        toks = self.vit.apply({"params": self.vit_params}, sem_input)
        gh, gw = toks["grid"]
        sem_feats = toks["x_norm_patchtokens"].reshape(
            render_224.shape[0], gh, gw, -1
        )
        sem_pyramid = self.jbu.apply(
            {"params": self.jbu_params}, sem_feats, sem_input
        )
        dists_feats = vgg16_pyramid(
            self.vgg_params, render_256, compute_dtype=compute_dtype
        )
        feats = EncoderFeats(dists_feats, sem_feats, sem_pyramid)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

    # -- trainable decoder ---------------------------------------------------
    def init(self, seed: int = 0):
        rng = jax.random.PRNGKey(seed)
        dummy = self.encode(
            jnp.zeros((1, self.render_size, self.render_size, 3), jnp.float32),
            jnp.zeros((1, self.sem_size, self.sem_size, 3), jnp.float32),
        )
        return self.decoder.init(
            rng, dummy.dists_feats, dummy.sem_feats, dummy.sem_pyramid,
            True,
        )["params"]

    def pred_gt_dists_feats(self, decoder_params, feats: EncoderFeats,
                            deterministic: bool = True, rng=None):
        """Predict the GT DISTS pyramid (model_nr_v8.py:217-236).

        With score_reg_channels > 0 (v3-v6 configs) returns
        (predicted_feats, score_reg) — score_reg (N, k) from the auxiliary
        head; otherwise just predicted_feats."""
        rngs = {"dropout": rng} if rng is not None else {}
        return self.decoder.apply(
            {"params": decoder_params},
            feats.dists_feats, feats.sem_feats, feats.sem_pyramid,
            deterministic, rngs=rngs,
        )

    def _split_decode(self, out):
        if self.cfg.score_reg_channels > 0:
            return out
        return out, None

    def calibrate_score(self, score: jax.Array, score_reg: jax.Array):
        """v6 calibration (model_nr_v6.py:188-240): score adjusted by the
        regressed residual; with 4 channels also returns the normalized
        score (score - pred_mean) / pred_std after reg_activation."""
        cfg = self.cfg
        act = {"relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid}.get(
            cfg.reg_activation, lambda v: v
        )
        adjusted = score + cfg.score_reg_scale * score_reg[:, 0]
        if score_reg.shape[-1] >= 4:
            pred_std = act(score_reg[:, 2]) + 1e-6
            pred_mean = act(score_reg[:, 3])
            return adjusted, (adjusted - pred_mean) / pred_std
        return adjusted, adjusted

    def forward_from_feats(self, decoder_params, feats: EncoderFeats,
                           deterministic: bool = True, rng=None) -> jax.Array:
        """Per-image NR score (model_nr_v8.py:239-246). For v3-v6 configs
        the auxiliary regression adjusts the score (v6 semantics)."""
        out = self.pred_gt_dists_feats(decoder_params, feats,
                                       deterministic, rng)
        predicted, score_reg = self._split_decode(out)
        score = dists.score_from_feats(
            self.dists_weights, feats.dists_feats, predicted, self.cfg.dists
        )
        if score_reg is not None:
            score, _ = self.calibrate_score(score, score_reg)
        return score

    def forward(self, decoder_params, render_256, render_224,
                deterministic: bool = True, rng=None) -> jax.Array:
        return self.forward_from_feats(
            decoder_params, self.encode(render_256, render_224),
            deterministic, rng,
        )

    # -- losses ---------------------------------------------------------------
    def losses(self, decoder_params, gt_image, render_256, render_224,
               rng=None, score_std=None, score_mean=None) -> dict[str, jax.Array]:
        """Self-supervised training losses (model_nr_v8.py:250-274).

        For v6-style configs (score_reg_channels >= 4), per-frame dataset
        DISTS std/mean targets supervise the calibration outputs
        (model_nr_v6.py:243-276)."""
        cfg = self.cfg
        compute_dtype = (
            jnp.bfloat16 if cfg.dists.compute_dtype == "bfloat16"
            else jnp.float32
        )
        # One VGG stream for render+GT (rather than encode() + a separate
        # gt pyramid): halves the conv work of the training step.
        n = render_256.shape[0]
        sem_input = render_224 if cfg.vit_model == "dinov2" else render_256
        toks = self.vit.apply({"params": self.vit_params}, sem_input)
        gh, gw = toks["grid"]
        sem_feats = toks["x_norm_patchtokens"].reshape(n, gh, gw, -1)
        sem_pyramid = self.jbu.apply(
            {"params": self.jbu_params}, sem_feats, sem_input
        )
        both = vgg16_pyramid(
            self.vgg_params, jnp.concatenate([render_256, gt_image], axis=0),
            compute_dtype=compute_dtype,
        )
        feats = EncoderFeats(
            [f[:n] for f in both], sem_feats, sem_pyramid
        )
        feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        gt_feats = [jax.lax.stop_gradient(f[n:]) for f in both]
        out = self.pred_gt_dists_feats(
            decoder_params, feats, deterministic=rng is None, rng=rng
        )
        predicted, score_reg = self._split_decode(out)
        predicted_score = dists.score_from_feats(
            self.dists_weights, feats.dists_feats, predicted, cfg.dists
        )
        gt_dists_score = jax.lax.stop_gradient(
            dists.score_from_feats(
                self.dists_weights, gt_feats, feats.dists_feats, cfg.dists
            )
        )
        l1 = jnp.abs(predicted_score - gt_dists_score).mean()
        pref2ref = dists.score_from_feats(
            self.dists_weights, predicted, gt_feats, cfg.dists,
            batch_average=True,
        )
        combined = (
            cfg.dists_pref2ref_coeff * pref2ref
            + (1.0 - cfg.dists_pref2ref_coeff) * l1
        )
        losses = {"dists_pref2ref": pref2ref, "l1": l1, "combined": combined}
        if cfg.re_encode_coeff > 0:
            # v3 manifold consistency: the predicted pyramid level 0 is a
            # 3-channel image — push it back through the frozen VGG and
            # penalize divergence from the predicted deeper features
            # (model_nr_v3.py re-encodes predictions through the actual
            # DISTS stages so they stay on the VGG manifold).
            re_feats = vgg16_pyramid(
                self.vgg_params, jnp.clip(predicted[0], 0.0, 1.0),
                compute_dtype=compute_dtype,
            )
            re_loss = sum(
                jnp.abs(rf.astype(jnp.float32) - pf.astype(jnp.float32)).mean()
                for rf, pf in zip(re_feats[1:], predicted[1:])
            ) / (len(predicted) - 1)
            losses["re_encode"] = re_loss
            combined = combined + cfg.re_encode_coeff * re_loss
            losses["combined"] = combined
        if score_reg is not None and score_reg.shape[-1] >= 4 \
                and score_std is not None:
            act = {"relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid}.get(
                cfg.reg_activation, lambda v: v
            )
            std_loss = jnp.abs(act(score_reg[:, 2]) - score_std).mean()
            mean_loss = jnp.abs(act(score_reg[:, 3]) - score_mean).mean()
            losses["std_loss"] = std_loss
            losses["mean_loss"] = mean_loss
            losses["combined"] = combined + std_loss + mean_loss
        return losses
