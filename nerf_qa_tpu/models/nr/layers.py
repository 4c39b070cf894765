"""NR decoder building blocks (flax.linen).

Reference behavior: model_nr_v8.py:17-51 (ConvLayer / ConvTransposeLayer:
Dropout2d -> conv -> ChannelNorm -> GELU) and the earlier-generation
BatchNorm+ReLU blocks of model_nr.py:90-94 (v1-v6). ChannelNorm is
FeatUp's per-pixel channel LayerNorm (featup.layers.ChannelNorm).

TPU notes: NHWC; conv kernels HWIO; Dropout2d drops whole channels
(feature maps) per sample, matching torch's Dropout2d semantics.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from nerf_qa_tpu.ops.pallas.channelnorm import channel_norm_act
from nerf_qa_tpu.ops.subpixel import conv_transpose_2x_subpixel


def _subpixel_ct_enabled() -> bool:
    """Opt-in (NERF_QA_TPU_SUBPIXEL_CT=1) sub-pixel formulation of the
    2x transposed convs (ops/subpixel.py) — a MEASURED NEGATIVE on v5e
    despite 2.25x fewer nominal MACs: B=8 serving forward 199.7 ms vs
    186.0 ms for the default input-dilated nn.ConvTranspose lowering
    (decoder stage 137.9 vs 127.1 ms), train step 481.2 vs 463.6 ms. XLA:TPU
    already exploits the dilated input's structural zeros, and the
    4O-channel 2x2 conv + pixel-shuffle transpose costs an extra
    relayout pass that eats the saving. Kept as a reference formulation
    (exact parity, same param tree) like ops/pallas/channelnorm."""
    return os.environ.get("NERF_QA_TPU_SUBPIXEL_CT", "0") == "1"


class SubpixelConvTranspose(nn.Module):
    """Param-tree-compatible stand-in for nn.ConvTranspose((3,3), s=2,
    padding=((1,2),(1,2))): same 'kernel'/'bias' params (same init), same
    outputs to float rounding, sub-pixel compute path. Instantiate with
    name='ConvTranspose_0' so checkpoints are interchangeable."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        return conv_transpose_2x_subpixel(
            x, kernel.astype(self.dtype), bias
        )


def _fused_cn_enabled() -> bool:
    """Opt-in (NERF_QA_TPU_FUSED_CN=1) Pallas ChannelNorm — a MEASURED
    NEGATIVE on v5e, kept as a reference formulation like
    ops/pallas/windowed_tsd: the jnp oracle already runs at the chip's
    elementwise-pass envelope (3.5 ms at 256²x448 B=8 ≈ one fused XLA
    multiply pass), while the Pallas pipeline itself tops out at
    ~145 GB/s even for a pure copy kernel (vs ~175 GB/s aggregate for
    XLA elementwise) — so the fused kernel made the NR train step 2x
    SLOWER (765 vs 358 ms at B=4). Pallas wins here only when a kernel
    removes MANY passes (the 49-shift JBU), not 2-3-pass fusions."""
    return os.environ.get("NERF_QA_TPU_FUSED_CN") == "1"


class ChannelNorm(nn.Module):
    """LayerNorm over the channel axis at every spatial position
    (FeatUp's ChannelNorm; used by model_nr_v8.py:22,40).

    Statistics always accumulate in fp32 (bf16 mean/var loses the
    DISTS-relevant precision); output returns in the input dtype.
    ``gelu=True`` fuses the block's GELU activation into the same
    pass (one HBM round-trip instead of three on TPU via the Pallas
    kernel, ops/pallas/channelnorm.py)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, gelu: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if _fused_cn_enabled():
            return channel_norm_act(x, scale, bias, gelu=gelu,
                                    eps=self.eps)
        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = jnp.square(xf - mean).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        if gelu:
            # exact (erf) GELU: torch nn.GELU's default, so converted
            # reference checkpoints reproduce bit-faithfully
            y = nn.gelu(y, approximate=False)
        return y.astype(in_dtype)


class Dropout2d(nn.Module):
    """Channel dropout (torch Dropout2d): zero whole channels per sample."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
        return jnp.where(mask, x / keep, 0.0)


class ConvLayer(nn.Module):
    """Dropout2d -> 3x3 conv -> norm -> activation (model_nr_v8.py:17-33).

    norm_type='channel' (v7/v8: ChannelNorm+GELU) or 'batch'
    (v1-v6: BatchNorm+ReLU, model_nr.py:91). activation disabled on the
    blocks' last layer.
    """

    features: int
    activation: bool = True
    dropout_rate: float = 0.0
    norm_type: str = "channel"
    dtype: jnp.dtype = jnp.float32  # bf16 computation, fp32 params

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dropout2d(self.dropout_rate)(x.astype(self.dtype), deterministic)
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        if self.norm_type == "channel":
            x = ChannelNorm(self.features)(x, gelu=self.activation)
        else:
            x = nn.BatchNorm(use_running_average=deterministic,
                             dtype=self.dtype)(x)
            if self.activation:
                x = nn.relu(x)
        return x


class ConvTransposeLayer(nn.Module):
    """Dropout2d -> 2x upsampling transposed conv -> norm -> activation
    (model_nr_v8.py:35-51: ConvTranspose2d(k=3, s=2, p=1, output_p=1))."""

    features: int
    activation: bool = False
    dropout_rate: float = 0.0
    norm_type: str = "channel"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dropout2d(self.dropout_rate)(x.astype(self.dtype), deterministic)
        # torch ConvTranspose2d(3, stride 2, pad 1, out_pad 1) == exact 2x.
        # padding ((1,2),(1,2)) reproduces torch's output alignment
        # EXACTLY (verified vs a torch oracle; plain "SAME" is the same
        # geometry shifted by one pixel), so reference checkpoints import
        # bit-faithfully (compat/torch_nr.py flips the kernel spatially —
        # torch's transposed conv correlates with the flipped kernel).
        # The sub-pixel formulation is opt-in and measured slower here
        # (see _subpixel_ct_enabled).
        if _subpixel_ct_enabled():
            x = SubpixelConvTranspose(self.features, dtype=self.dtype,
                                      name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 dtype=self.dtype)(x)
        if self.norm_type == "channel":
            x = ChannelNorm(self.features)(x, gelu=self.activation)
        else:
            x = nn.BatchNorm(use_running_average=deterministic,
                             dtype=self.dtype)(x)
            if self.activation:
                x = nn.relu(x)
        return x


class Mlp(nn.Module):
    """Transformer MLP (reference vendored nerf_qa/layers/mlp.py:17-41)."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU (exact erf)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        return x


class LayerScale(nn.Module):
    """Per-channel learned residual scaling
    (nerf_qa/layers/layer_scale.py:16-28)."""

    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.dim,),
        )
        return x * gamma


class Attention(nn.Module):
    """Multi-head self-attention (nerf_qa/layers/attention.py). The
    reference's xformers memory-efficient path is unnecessary at the NR
    model's 256-token sequences; plain dot-product attention maps straight
    onto the MXU."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,N,H,D)
        q = jnp.swapaxes(q, 1, 2)  # (B,H,N,D)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * (head_dim**-0.5), k,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype)(out.astype(self.dtype))


class TransformerBlock(nn.Module):
    """Pre-norm transformer block with LayerScale
    (nerf_qa/layers/block.py:36-131; stochastic depth omitted — the NR
    models instantiate blocks with drop_path=0)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale_init: float = 1.0
    dtype: jnp.dtype = jnp.float32
    # torch nn.LayerNorm's default — the NR transformer_decoder blocks
    # (block.py norm_layer=nn.LayerNorm). DINOv2's ViT overrides 1e-6.
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=self.norm_eps)(x)
        h = Attention(self.dim, self.num_heads, dtype=self.dtype)(h)
        x = x + LayerScale(self.dim, self.layer_scale_init)(h)
        h = nn.LayerNorm(epsilon=self.norm_eps)(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                dtype=self.dtype)(h)
        x = x + LayerScale(self.dim, self.layer_scale_init)(h)
        return x
