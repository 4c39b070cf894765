"""Checkpoint save/restore + resumable training state.

The reference has write-only checkpointing (whole-module torch pickles,
run_final.py:277,326; loaded only by reeval.py:83) and NO resume path
(SURVEY §5.4). TPU pods preempt, so this framework adds real
checkpoint/resume: orbax-backed step-tagged checkpoints of
(params, opt_state, step, rng) with latest-step restore, plus converters
for the reference's torch artifacts.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


# Model-geometry format version, stamped into every checkpoint dir.
# Bump when layer numerics change such that old params load but score
# wrong: v2 = the torch-exact alignment (ConvTranspose padding
# ((1,2),(1,2)), exact-erf GELU, LayerNorm eps) — a v1-geometry
# checkpoint restored into v2 layers would be silently miscalibrated,
# so restore fails loudly on a mismatched stamp instead.
CHECKPOINT_FORMAT = 2


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    """Save a pytree training state under ckpt_dir/step_<N>."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    _checkpointer().save(
        path, jax.tree_util.tree_map(np.asarray, state), force=True
    )
    with open(os.path.join(ckpt_dir, "FORMAT"), "w") as f:
        f.write(f"{CHECKPOINT_FORMAT}\n")
    return path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: int | None = None,
                       target: Any = None) -> tuple[int, Any] | None:
    """Restore (step, state); latest step when unspecified. None if no
    checkpoint exists (fresh start). Raises on a FORMAT stamp older than
    the current model geometry (see CHECKPOINT_FORMAT) — an unstamped dir
    is accepted as current (all stamped writers postdate the alignment)."""
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        return None
    fmt_path = os.path.join(os.path.abspath(ckpt_dir), "FORMAT")
    if os.path.exists(fmt_path):
        with open(fmt_path) as f:
            fmt = int(f.read().strip() or 0)
        if fmt != CHECKPOINT_FORMAT:
            raise ValueError(
                f"{ckpt_dir}: checkpoint format {fmt} != current "
                f"{CHECKPOINT_FORMAT} (layer geometry changed; re-train or "
                f"re-import via compat/torch_nr)"
            )
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    state = _checkpointer().restore(path, item=target)
    return step, state


class PreemptionSaver:
    """Save-on-signal hook (SIGTERM — TPU pod preemption notice).

    Usage: saver = PreemptionSaver(ckpt_dir); inside the train loop call
    ``saver.maybe_save(step, state)`` — it saves when a preemption signal
    arrived (and every ``interval`` steps if set).
    """

    def __init__(self, ckpt_dir: str, interval: int | None = None):
        import signal

        self.ckpt_dir = ckpt_dir
        self.interval = interval
        self.signaled = False

        def handler(signum, frame):
            self.signaled = True

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:  # non-main thread
            pass

    def maybe_save(self, step: int, state: Any) -> bool:
        due = self.signaled or (
            self.interval is not None and step > 0 and step % self.interval == 0
        )
        if due:
            save_checkpoint(self.ckpt_dir, step, state)
            self.signaled = False
            return True
        return False


def _fr_head_from_state(state) -> dict[str, np.ndarray]:
    """model_stats.py:45-60 head parameters (b1..b4 / dists_weight+bias)
    plus fine-tuned dists alpha/beta from an FR state dict."""
    out: dict[str, np.ndarray] = {}
    for torch_key, ours in [
        ("b1", "b1"), ("b2", "b2"), ("b3", "b3"), ("b4", "b4"),
        ("dists_weight", "weight"), ("dists_bias", "bias"),
    ]:
        if torch_key in state:
            out[f"head.{ours}"] = state[torch_key].detach().numpy()
    for key in ("dists_model.alpha", "dists_model.beta"):
        if key in state:
            out[key.replace("dists_model.", "dists.")] = (
                state[key].detach().numpy().reshape(-1)
            )
    return out


def convert_fr_head_from_torch(path: str) -> dict[str, np.ndarray]:
    """Import a reference FR ``model.pth`` head (see _fr_head_from_state)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return _fr_head_from_state(
        obj.state_dict() if hasattr(obj, "state_dict") else obj
    )


def convert_fr_model_from_torch(path: str):
    """Full FR ``model.pth`` import: (head, alpha_beta|None, vgg|None).

    The saved NeRFQAModel embeds its frozen DISTS (``dists.stageK.*``
    VGG stages + fine-tuned ``dists.alpha/beta``, model_stats.py:63-68)
    alongside the regression head, so one file restores the whole
    scoring path. See convert_fr_head_from_torch for the head mapping.
    """
    from nerf_qa_tpu.compat.torch_nr import extract_dists_alpha_beta
    from nerf_qa_tpu.compat.torch_weights import extract_vgg16_from_dists

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return (_fr_head_from_state(sd), extract_dists_alpha_beta(sd),
            extract_vgg16_from_dists(sd))
