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
decoder (SURVEY §2 #9-16): zero-seeded cascades + BatchNorm blocks for
v1-v6 (batch_stats collections threaded through init/apply/train_step),
v3's RefineDown re-encoding + score head, v4's decoder-off regression,
v5/v6's calibrated multi-channel heads with MAE-map / std / mean losses
(model_nr_v5.py:235-250, model_nr_v6.py:245-276).

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
    sem_pyramid: list  # 6-level upsampled semantic pyramid (v7/v8)


class NRModel:
    """Bundles frozen encoder params + trainable decoder module.

    ``init`` returns ``(decoder_params, decoder_state)`` — the state dict
    carries mutable collections (``batch_stats`` for the v1-v6 BatchNorm
    generations; empty for v7/v8). Encoder params are attributes (frozen,
    replicated at train time).
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
        # the JBU semantic pyramid exists only in the FeatUp generations
        # (v7/v8, model_nr_v7.py:107-131); v1-v6 consume raw ViT tokens
        self.use_jbu = cfg.version >= 7
        self.jbu = JBUStack(dim=self.vit.embed_dim) if self.use_jbu else None
        self.decoder = NRDecoder(cfg=cfg, sem_dim=self.vit.embed_dim)
        rng = jax.random.PRNGKey(seed)
        k_vit, k_jbu = jax.random.split(rng)
        grid = sem_size // self.vit.patch_size
        if vit_params is None:
            dummy = jnp.zeros((1, sem_size, sem_size, 3), jnp.float32)
            vit_params = self.vit.init(k_vit, dummy)["params"]
        if jbu_params is None and self.use_jbu:
            dummy_f = jnp.zeros((1, grid, grid, self.vit.embed_dim), jnp.float32)
            dummy_i = jnp.zeros((1, sem_size, sem_size, 3), jnp.float32)
            jbu_params = self.jbu.init(k_jbu, dummy_f, dummy_i)["params"]
        self.vit_params = vit_params
        self.jbu_params = jbu_params

    def frozen_params(self):
        """Pytree of the frozen encoder weights + DISTS α/β.

        Trainers/serving jits should pass this into forward/losses as an
        ARGUMENT (``frozen=``) instead of letting trace-time closure
        embed the attributes as executable constants: with ~150 MB of
        frozen weights folded in, serialized NR executables measured
        335-368 MB, and loading one through a slow link (this harness's
        tunnel) can exceed the compile it was meant to save. ``None``
        anywhere keeps the attribute-reading behavior."""
        return {
            "vgg": self.vgg_params,
            "vit": self.vit_params,
            "jbu": self.jbu_params,
            "dists_w": self.dists_weights,
        }

    def _frozen(self, frozen):
        return self.frozen_params() if frozen is None else frozen

    # -- encoder (frozen) --------------------------------------------------
    def _sem_encode(self, sem_input, sem_tokens=None, frozen=None):
        """ViT patch-token map (+ JBU pyramid). ``sem_tokens`` — an
        (N, gh, gw, dim) array from the offline feature cache
        (data/feature_cache.py; reference model.py:165-196) — skips the
        frozen ViT forward; JBU still runs (it needs the guidance image
        and is cheap MXU work)."""
        f = self._frozen(frozen)
        if sem_tokens is not None:
            sem_feats = sem_tokens.astype(jnp.float32)
        else:
            toks = self.vit.apply({"params": f["vit"]}, sem_input)
            gh, gw = toks["grid"]
            sem_feats = toks["x_norm_patchtokens"].reshape(
                sem_input.shape[0], gh, gw, -1
            )
        if self.use_jbu:
            sem_pyramid = self.jbu.apply(
                {"params": f["jbu"]}, sem_feats, sem_input
            )
        else:
            sem_pyramid = []
        return sem_feats, sem_pyramid

    def encode(self, render_256: jax.Array, render_224: jax.Array,
               sem_tokens=None, frozen=None) -> EncoderFeats:
        """Frozen feature extraction (model_nr_v8.py:156-166)."""
        f = self._frozen(frozen)
        compute_dtype = (
            jnp.bfloat16 if self.cfg.dists.compute_dtype == "bfloat16"
            else jnp.float32
        )
        sem_input = render_224 if self.cfg.vit_model == "dinov2" else render_256
        sem_feats, sem_pyramid = self._sem_encode(sem_input, sem_tokens, f)
        dists_feats = vgg16_pyramid(
            f["vgg"], render_256, compute_dtype=compute_dtype
        )
        feats = EncoderFeats(dists_feats, sem_feats, sem_pyramid)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

    # -- trainable decoder ---------------------------------------------------
    def init(self, seed: int = 0):
        """Returns (decoder_params, decoder_state)."""
        rng = jax.random.PRNGKey(seed)
        dummy = self.encode(
            jnp.zeros((1, self.render_size, self.render_size, 3), jnp.float32),
            jnp.zeros((1, self.sem_size, self.sem_size, 3), jnp.float32),
        )
        variables = self.decoder.init(
            rng, dummy.dists_feats, dummy.sem_feats, dummy.sem_pyramid,
            True, self._decoder_vgg(),
        )
        params = variables["params"]
        state = {k: v for k, v in variables.items() if k != "params"}
        return params, state

    def _decoder_vgg(self, frozen=None):
        if self.cfg.version != 3:
            return None
        return self._frozen(frozen)["vgg"]

    def apply_decoder(self, decoder_params, feats: EncoderFeats,
                      deterministic: bool = True, rng=None, state=None,
                      frozen=None):
        """Run the decoder; returns ((predicted, score_reg_map), new_state).

        In training mode (deterministic=False) the BatchNorm generations
        update their batch_stats collection (returned in new_state; the
        trainer threads it, the reference's implicit nn.BatchNorm running
        stats made functional)."""
        state = state or {}
        rngs = {"dropout": rng} if rng is not None else {}
        variables = {"params": decoder_params, **state}
        args = (feats.dists_feats, feats.sem_feats, feats.sem_pyramid,
                deterministic, self._decoder_vgg(frozen))
        if not deterministic and "batch_stats" in state:
            out, new_vars = self.decoder.apply(
                variables, *args, rngs=rngs, mutable=["batch_stats"]
            )
            return out, dict(state, **new_vars)
        out = self.decoder.apply(variables, *args, rngs=rngs)
        return out, state

    def pred_gt_dists_feats(self, decoder_params, feats: EncoderFeats,
                            deterministic: bool = True, rng=None, state=None,
                            frozen=None):
        """Predict the GT DISTS pyramid (model_nr_v8.py:217-236)."""
        (predicted, _), _ = self.apply_decoder(
            decoder_params, feats, deterministic, rng, state, frozen
        )
        return predicted

    # -- score-regression calibration -----------------------------------------
    def _reg_outputs(self, reg_map: jax.Array) -> dict[str, jax.Array]:
        """Pool/calibrate the score-regression map. Channel meanings by
        version: v3/v4 scalar residual (model_nr_v4.py:179-188); v5
        (residual, MAE map) (model_nr_v5.py:181-184); v6 adds calibrated
        (pred_std, pred_mean) with hard-coded affines per reg_activation
        (model_nr_v6.py:188-203)."""
        cfg = self.cfg
        k = reg_map.shape[-1]
        out: dict[str, jax.Array] = {}
        if k == 1:
            out["dists_res"] = reg_map.mean(axis=(1, 2, 3))
            return out
        mean = reg_map.mean(axis=(1, 2))  # (N, k)
        if k < 4:
            out["dists_res"] = mean[:, 0]
            out["mae_map"] = reg_map[..., 1]
            return out
        out["dists_res"] = mean[:, 0] * 0.1
        out["mae_map"] = reg_map[..., 1] * 0.1 + 0.1
        if cfg.reg_activation == "relu":
            out["pred_std"] = jax.nn.relu(mean[:, 2] * 0.05 + 0.05)
            out["pred_mean"] = jax.nn.relu(mean[:, 3] * 0.1 + 0.1)
        elif cfg.reg_activation == "sigmoid":
            out["pred_std"] = jax.nn.sigmoid(mean[:, 2] * 1.0 - 3.0)
            out["pred_mean"] = jax.nn.sigmoid(mean[:, 3] * 0.9 - 2.2)
        else:
            out["pred_std"] = mean[:, 2] * 0.05 + 0.05
            out["pred_mean"] = mean[:, 3] * 0.1 + 0.1
        return out

    def _compose_score(self, feats: EncoderFeats, predicted, reg_map,
                       frozen=None):
        """Per-image score + aux regression outputs. v4 returns the pure
        regression (model_nr_v4.py:214-224); v3/v5/v6 add
        score_reg_scale * residual (model_nr_v6.py:227-233)."""
        if predicted is None:  # v4
            reg = self._reg_outputs(reg_map)
            return reg["dists_res"], reg
        score = dists.score_from_feats(
            self._frozen(frozen)["dists_w"], feats.dists_feats, predicted,
            self.cfg.dists
        )
        if reg_map is None:
            return score, {}
        reg = self._reg_outputs(reg_map)
        score = score + self.cfg.score_reg_scale * reg["dists_res"]
        return score, reg

    def forward_from_feats(self, decoder_params, feats: EncoderFeats,
                           deterministic: bool = True, rng=None,
                           state=None, frozen=None) -> jax.Array:
        """Per-image NR score (model_nr_v8.py:239-246)."""
        (predicted, reg_map), _ = self.apply_decoder(
            decoder_params, feats, deterministic, rng, state, frozen
        )
        score, _ = self._compose_score(feats, predicted, reg_map, frozen)
        return score

    def forward(self, decoder_params, render_256, render_224,
                deterministic: bool = True, rng=None, state=None,
                sem_tokens=None, frozen=None) -> jax.Array:
        return self.forward_from_feats(
            decoder_params,
            self.encode(render_256, render_224, sem_tokens, frozen),
            deterministic, rng, state, frozen,
        )

    def forward_normalized(self, decoder_params, render_256, render_224,
                           state=None, frozen=None):
        """v6's (score, normalized) forward (model_nr_v6.py:227-240):
        normalized = (score - pred_mean) / (pred_std + 1e-7)."""
        feats = self.encode(render_256, render_224, frozen=frozen)
        (predicted, reg_map), _ = self.apply_decoder(
            decoder_params, feats, True, None, state, frozen
        )
        score, reg = self._compose_score(feats, predicted, reg_map, frozen)
        if "pred_std" not in reg:
            return score, score
        return score, (score - reg["pred_mean"]) / (reg["pred_std"] + 1e-7)

    # -- losses ---------------------------------------------------------------
    def losses(self, decoder_params, gt_image, render_256, render_224,
               rng=None, score_std=None, score_mean=None, state=None,
               score_map=None, sem_tokens=None, frozen=None):
        """Self-supervised training losses (model_nr_v8.py:250-274).
        Returns (losses_dict, new_decoder_state).

        Version extras: v5/v6 MAE-map regression vs |gt - render| and (v6)
        std/mean calibration vs per-frame dataset DISTS std/mean targets,
        all folded into the (1-coeff) term (model_nr_v5.py:235-250,
        model_nr_v6.py:245-276)."""
        cfg = self.cfg
        f = self._frozen(frozen)
        compute_dtype = (
            jnp.bfloat16 if cfg.dists.compute_dtype == "bfloat16"
            else jnp.float32
        )
        # One VGG stream for render+GT (rather than encode() + a separate
        # gt pyramid): halves the conv work of the training step.
        n = render_256.shape[0]
        sem_input = render_224 if cfg.vit_model == "dinov2" else render_256
        sem_feats, sem_pyramid = self._sem_encode(sem_input, sem_tokens, f)
        both = vgg16_pyramid(
            f["vgg"], jnp.concatenate([render_256, gt_image], axis=0),
            compute_dtype=compute_dtype,
        )
        feats = EncoderFeats(
            [f[:n] for f in both], sem_feats, sem_pyramid
        )
        feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        gt_feats = [jax.lax.stop_gradient(f[n:]) for f in both]
        (predicted, reg_map), new_state = self.apply_decoder(
            decoder_params, feats, deterministic=rng is None, rng=rng,
            state=state, frozen=f,
        )
        predicted_score, reg = self._compose_score(feats, predicted,
                                                   reg_map, f)
        gt_dists_score = jax.lax.stop_gradient(
            dists.score_from_feats(
                f["dists_w"], gt_feats, feats.dists_feats, cfg.dists
            )
        )
        l1 = jnp.abs(predicted_score - gt_dists_score).mean()
        losses = {"l1": l1}
        l1_total = l1
        if "mae_map" in reg:
            gt_mae = jnp.abs(gt_image - render_256).mean(axis=-1)
            mae_l1 = jnp.abs(reg["mae_map"] - gt_mae).mean()
            losses["mae_reg_l1_loss"] = mae_l1
            l1_total = l1_total + mae_l1
        if "pred_std" in reg and score_std is not None:
            std_l1 = jnp.abs(reg["pred_std"] - score_std).mean()
            mean_l1 = jnp.abs(reg["pred_mean"] - score_mean).mean()
            losses["dists_std_l1"] = std_l1
            losses["dists_mean_l1"] = mean_l1
            l1_total = l1_total + std_l1 + mean_l1
        if predicted is None:  # v4: no feature prediction, pure regression
            losses["combined"] = l1_total
            return losses, new_state
        pref2ref = dists.score_from_feats(
            f["dists_w"], predicted, gt_feats, cfg.dists,
            batch_average=True,
        )
        combined = (
            cfg.dists_pref2ref_coeff * pref2ref
            + (1.0 - cfg.dists_pref2ref_coeff) * l1_total
        )
        losses["dists_pref2ref"] = pref2ref
        if cfg.re_encode_coeff > 0:
            # optional manifold-consistency regularizer (a lightweight
            # alternative to v3's learned RefineDown): re-encode the
            # predicted image through the frozen VGG and pull the
            # predicted features toward it.
            re_feats = vgg16_pyramid(
                f["vgg"], jnp.clip(predicted[0], 0.0, 1.0),
                compute_dtype=compute_dtype,
            )
            re_loss = sum(
                jnp.abs(rf.astype(jnp.float32) - pf.astype(jnp.float32)).mean()
                for rf, pf in zip(re_feats[1:], predicted[1:])
            ) / (len(predicted) - 1)
            losses["re_encode"] = re_loss
            combined = combined + cfg.re_encode_coeff * re_loss
        if score_map is not None:
            # score-map objective (mode='score-map'): ADISTS map between
            # the render and the predicted GT image, compared in the
            # -log10 space the prep encodes (tools/prep_nr.write_score_maps
            # mirrors nerf_nr_qa_prep_4.py:101-135)
            from nerf_qa_tpu.config import ADISTSConfig
            from nerf_qa_tpu.core import adists
            from nerf_qa_tpu.ops.resize import resize_bilinear

            pred_img = jnp.clip(predicted[0].astype(jnp.float32), 0.0, 1.0)
            amap = adists.forward(
                f["vgg"], pred_img, render_256,
                ADISTSConfig(compute_dtype=cfg.dists.compute_dtype),
                as_map=True,
            )
            pred_log = -jnp.log10(jnp.clip(amap, 1e-6, None))
            target = score_map.astype(jnp.float32)
            if target.ndim == 4:
                target = target[..., 1] if target.shape[-1] >= 3 \
                    else target[..., 0]
            if target.shape[1:3] != pred_log.shape[1:3]:
                target = resize_bilinear(
                    target[..., None], pred_log.shape[1], pred_log.shape[2]
                )[..., 0]
            sm_l1 = jnp.abs(pred_log - target).mean()
            losses["score_map_l1"] = sm_l1
            combined = combined + cfg.score_map_coeff * sm_l1
        losses["combined"] = combined
        return losses, new_state
