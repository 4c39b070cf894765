"""Explicit config dataclasses.

The reference threads hyperparameters through a global ``wandb.config``
read from inside library code (e.g. DISTS_pt_original.py:69-72,111-119,
model_stats.py:31-66, model_nr_v8.py:20,94,97) — a hidden global coupling.
Here every tunable is an explicit dataclass passed to constructors/functions;
``from_args`` helpers keep CLI/sweep overridability.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


def _update_from_dict(cfg, overrides: dict[str, Any]):
    names = {f.name for f in dataclasses.fields(cfg)}
    kwargs = {k: v for k, v in overrides.items() if k in names}
    return dataclasses.replace(cfg, **kwargs)


@dataclass(frozen=True)
class DISTSConfig:
    """DISTS metric configuration (covers the reference's three variants).

    variant='main'     -> DISTS_pt.py       (raw α/β, joint-sum norm)
    variant='original' -> DISTS_pt_original (clamped load, norm modes)
    variant='softmax'  -> DISTS_pt_softmax  (α/β stored as logits)
    """

    variant: str = "main"
    # '+'-combinable tokens: 'relu', 'w_sum_detach'
    # (DISTS_pt_original.py:111-119); ignored by variant='softmax'.
    weight_norm: str = ""
    detach_beta: bool = False
    # load-time clamping for variant='original' (DISTS_pt_original.py:69-72)
    weight_lower_bound: float = 0.0
    alpha_beta_ratio: float = 1.0
    # TPU execution knobs (no reference equivalent)
    compute_dtype: str = "float32"  # 'bfloat16' for MXU-speed convs
    stats_impl: str = "xla"  # 'xla' (oracle) | 'pallas' (fused moments)
    c1: float = 1e-6
    c2: float = 1e-6

    def replace(self, **kw) -> "DISTSConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class ADISTSConfig:
    """ADISTS metric configuration (ADISTS/ADISTS.py:34-69)."""

    window_size: int = 21
    compute_dtype: str = "float32"
    # full-resolution execution knobs (no reference equivalent): stages
    # with more than block_pixels_threshold pixels process their windowed
    # statistics in channel blocks under lax.scan so the VALID moment
    # maps never materialize at full channel width (at 1080p one fp32
    # stage-1 moment buffer is ~0.5 GB; five are live at once unblocked)
    block_pixels_threshold: int = 448 * 448
    channel_block: int = 16
    # opt-in fused Pallas windowed-T/S kernel (ops/pallas/windowed_tsd);
    # measured slower than the banded-MXU path on v5e at 256² — see the
    # note in core/adists.forward. Default off.
    fused_tsd: bool | None = False

    def replace(self, **kw) -> "ADISTSConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class FRModelConfig:
    """Full-reference MOS-regression model (model.py / model_stats.py).

    regression_type: 'linear' | 'sqrt' | 'logistic' (model_stats.py:33-79)
    subjective_score_type: 'MOS' | 'DMOS' (model_stats.py:31-36)
    """

    regression_type: str = "linear"
    subjective_score_type: str = "MOS"
    dists: DISTSConfig = field(default_factory=DISTSConfig)

    def replace(self, **kw) -> "FRModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class NRModelConfig:
    """No-reference model family (model_nr.py .. model_nr_v8.py).

    ``version`` selects the architecture generation; v1-v7 differ from the
    v8 flagship only in norm type, channel schedules, residual scales and
    auxiliary heads (SURVEY §2 #9-16), so they are config points of one
    parameterized decoder rather than copied modules.
    """

    version: int = 8
    vit_model: str = "dinov2"  # semantic backbone family
    refine_up_depth: int = 2
    transformer_decoder_depth: int = 2
    dropout_rate: float = 0.2
    refine_scale1: float = 1.0
    refine_scale2: float = 0.1
    refine_scale3: float = 0.1
    refine_scale4: float = 0.1
    dists_pref2ref_coeff: float = 0.5
    # auxiliary score-regression head of the v3-v6 generations:
    # 0 = off (v7/v8); 1 = score residual (v4, model_nr_v4.py:179-188);
    # 2 = (+ mae map, v5:181-184); 4 = (+ pred_std, pred_mean,
    # v6:188-203 with reg_activation calibration)
    score_reg_channels: int = 0
    reg_activation: str = "linear"  # 'linear' | 'relu' | 'sigmoid'
    score_reg_scale: float = 1.0  # v3's wandb.config.score_reg_scale
    # v3's RefineDown manifold consistency (model_nr_v3.py:65-93,256-267):
    # re-encode the predicted image through the frozen pyramid and pull
    # the predicted features toward it. 0 = off (v8 default).
    re_encode_coeff: float = 0.0
    # score-map objective weight (mode='score-map' batches: predicted
    # ADISTS map vs the decoded -log10 map, nerf_nr_qa_prep_4.py:101-135)
    score_map_coeff: float = 1.0
    # TPU execution knobs (no reference equivalent)
    decoder_dtype: str = "float32"  # 'bfloat16': MXU-rate decoder convs
    # with fp32 master params/optimizer state (weights cast at use)
    remat: bool = False  # jax.checkpoint each RefineUp stage (trades
    # recompute for activation memory -> larger batches)
    dists: DISTSConfig = field(default_factory=DISTSConfig)

    @property
    def reg_channels(self) -> int:
        """Effective score-regression channel count: explicit override or
        the version's canonical head (v3/v4: 1, model_nr_v3.py:229-232 /
        model_nr_v4.py:179-188; v5: 2, model_nr_v5.py:163-166; v6: 4,
        model_nr_v6.py:167-170; otherwise none)."""
        if self.score_reg_channels > 0:
            return self.score_reg_channels
        return {3: 1, 4: 1, 5: 2, 6: 4}.get(self.version, 0)

    @property
    def norm_type(self) -> str:
        """BatchNorm+ReLU blocks for v1-v6, ChannelNorm+GELU for v7/v8
        (model_nr_v7.py:18-51 swap)."""
        return "channel" if self.version >= 7 else "batch"

    def replace(self, **kw) -> "NRModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule settings shared by FR/NR trainers
    (run_final.py:54-75, train-nr.py:180-203)."""

    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    epochs: int = 10
    batch_size: int = 32  # settings_fr.py DEVICE_BATCH_SIZE=32; NR uses 4
    optimizer: str = "adam"
    schedule: str = "exp"  # 'exp' | 'cosine' | 'constant'
    gamma: float = 0.95  # ExponentialLR decay (run_final.py:264)
    warmup_epochs: int = 1
    entropy_loss_coeff: float = 0.0
    project_weights: bool = False
    seed: int = 0
    folds: int = 4  # GroupKFold CV (run_final.py:231-239)
    # accumulate gradients over N micro-batches before each optimizer step
    # (run.py:138-167 accumulates a whole epoch, weighted 1/frame_count)
    grad_accum_steps: int = 0

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def from_args(cfg, args) -> Any:
    """Overlay argparse.Namespace / dict values onto a config dataclass."""
    if not isinstance(args, dict):
        args = vars(args)
    return _update_from_dict(cfg, args)
