"""VGG16 5-stage feature pyramid (the DISTS/ADISTS backbone), pure JAX.

Reference behavior: nerf_qa/DISTS_pytorch/DISTS_pt.py:27-55 — torchvision
VGG16 ``features[0..29]`` split into five stages at indices (0-3, 5-8,
10-15, 17-22, 24-29), with every MaxPool (indices 4, 9, 16, 23) replaced by
the anti-aliased :func:`~nerf_qa_tpu.ops.l2pool.l2pool`. Inputs are
normalized with ImageNet mean/std before stage 1.

TPU design
----------
* NHWC layout, HWIO kernels — native XLA:TPU conv layout; channel dim maps
  onto the 128-wide lane axis and convs onto the MXU.
* Convolutions optionally run in bfloat16 (weights + activations) with
  float32 accumulation (``preferred_element_type``); the pyramid outputs
  are always float32 because DISTS statistics need fp32 moments.
* Everything is a pure function of (params, x): jit/vmap/pjit friendly,
  no module state.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nerf_qa_tpu.ops.l2pool import l2pool

# (in_channels, out_channels) per conv, per stage. Stage boundaries follow
# DISTS_pt.py:36-49; channel sizes follow torchvision VGG16 'features'.
VGG16_STAGES: tuple[tuple[tuple[int, int], ...], ...] = (
    ((3, 64), (64, 64)),
    ((64, 128), (128, 128)),
    ((128, 256), (256, 256), (256, 256)),
    ((256, 512), (512, 512), (512, 512)),
    ((512, 512), (512, 512), (512, 512)),
)

# Channel width of each pyramid level [input, stage1..stage5]
# (DISTS_pt.py:57).
PYRAMID_CHANNELS: tuple[int, ...] = (3, 64, 128, 256, 512, 512)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

Params = Any  # nested dict pytree: {'stage1': [{'kernel','bias'}, ...], ...}


def init_vgg16_params(rng: jax.Array | None = None, seed: int = 0) -> Params:
    """He-normal initialized VGG16 pyramid params (HWIO kernels).

    Pretrained ImageNet weights are the production path — convert them with
    :mod:`nerf_qa_tpu.compat.torch_vgg`. Random init exists for tests and
    for environments without the torchvision checkpoint.
    """
    if rng is None:
        rng = jax.random.PRNGKey(seed)
    params = {}
    for si, stage in enumerate(VGG16_STAGES):
        layers = []
        for cin, cout in stage:
            rng, k1 = jax.random.split(rng)
            fan_in = 3 * 3 * cin
            kernel = jax.random.normal(k1, (3, 3, cin, cout), jnp.float32)
            kernel = kernel * np.sqrt(2.0 / fan_in)
            layers.append({"kernel": kernel, "bias": jnp.zeros((cout,), jnp.float32)})
        params[f"stage{si + 1}"] = layers
    return params


def _conv_relu(x: jax.Array, kernel: jax.Array, bias: jax.Array,
               compute_dtype: jnp.dtype) -> jax.Array:
    # fp32 mode is the parity oracle: force true-fp32 MXU passes
    # (XLA's default conv precision is bf16-grade even for f32 inputs).
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    x = x.astype(compute_dtype)
    # Serving (bf16) mode emits bf16 straight from the conv: TPU convs
    # can't fuse elementwise producers/consumers, so an fp32
    # ``preferred_element_type`` would materialize every activation at
    # 4 B/elem plus a separate convert pass (~2x the pyramid's HBM
    # traffic). MXU accumulation is fp32 either way; bf16 only rounds
    # the output write. fp32 (parity) mode keeps fp32 buffers.
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(compute_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
        precision=precision,
    )
    return jax.nn.relu(y + bias.astype(compute_dtype))


def normalize_imagenet(x: jax.Array) -> jax.Array:
    """(x - mean) / std on the trailing channel axis (DISTS_pt.py:92)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def vgg_stage_apply(
    params: Params,
    stage_idx: int,
    x: jax.Array,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Apply one frozen VGG stage (1-based). Stages 2-5 start with the
    anti-aliased L2 pool that replaces MaxPool (DISTS_pt.py:38-49).

    Used standalone by the NR v3 RefineDown re-encoding cascade
    (model_nr_v3.py:215-221 hands dists.stage1..stage5 to RefineDown)."""
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    h = x.astype(jnp.float32)
    if stage_idx > 1:
        h = l2pool(h, precision=precision)
    h = h.astype(compute_dtype)
    for layer in params[f"stage{stage_idx}"]:
        h = _conv_relu(h, layer["kernel"], layer["bias"], compute_dtype)
    return h


def vgg16_pyramid(
    params: Params,
    x: jax.Array,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> list[jax.Array]:
    """Run the 5-stage pyramid on NHWC images in [0, 1].

    Returns ``[x, relu1_2, relu2_2, relu3_3, relu4_3, relu5_3]`` — the exact
    feature list of ``DISTS.forward_once`` (DISTS_pt.py:91-103). Set
    ``compute_dtype=jnp.bfloat16`` to run convs on the MXU in bf16 with
    fp32 accumulation; in that mode the returned features are ALSO bf16 —
    at full resolution (1080p) fp32 pyramids exceed HBM (a single stage-1
    buffer is 4+ GB); downstream statistics upcast to fp32 inside their
    fused reductions, so precision of the moments is preserved.
    """
    pool_precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    feats = [x.astype(compute_dtype)]
    h = normalize_imagenet(x.astype(jnp.float32))
    for si in range(5):
        if si > 0:
            # h is already compute_dtype (conv output); the pool keeps
            # the flow dtype so serving never round-trips through fp32
            # activation buffers
            h = l2pool(h, precision=pool_precision)
        for layer in params[f"stage{si + 1}"]:
            h = _conv_relu(h, layer["kernel"], layer["bias"], compute_dtype)
        feats.append(h)
    return feats
