"""ViT-S/14 semantic backbone (DINOv2-with-registers architecture).

Reference behavior: the NR models' frozen semantic encoder is
``torch.hub.load('facebookresearch/dinov2', 'dinov2_vits14_reg')``
(model.py:64) or FeatUp's wrapped dinov2 (model_nr_v8.py:112-136). This is
a from-scratch flax implementation of that architecture: 14x14 patch
embed, CLS + 4 register tokens, learned position embeddings, 12 pre-norm
blocks (dim 384, 6 heads, LayerScale), final LayerNorm.
``forward_features`` returns the token dict the reference consumes
(``x_norm_patchtokens``, model_nr.py:123).

Pretrained DINOv2 weights convert via compat.torch_weights-style mapping
when a checkpoint file is supplied (no hub download in this environment);
random init is available for tests and self-supervised-free ablations.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from nerf_qa_tpu.models.nr.layers import TransformerBlock


class ViTS14(nn.Module):
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    num_registers: int = 4
    layer_scale_init: float = 1e-5

    @nn.compact
    def __call__(self, x):
        """x: NHWC image batch (e.g. 224x224). Returns token dict."""
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        patches = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="patch_embed",
        )(x)
        tokens = patches.reshape(b, gh * gw, self.embed_dim)

        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, gh * gw, self.embed_dim),
        )
        tokens = tokens + pos

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        regs = self.param("register_tokens", nn.initializers.zeros,
                          (1, self.num_registers, self.embed_dim))
        prefix = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)), jnp.tile(regs, (b, 1, 1))], axis=1
        )
        tokens = jnp.concatenate([prefix, tokens], axis=1)

        for i in range(self.depth):
            tokens = TransformerBlock(
                self.embed_dim, self.num_heads,
                layer_scale_init=self.layer_scale_init,
                norm_eps=1e-6,  # DINOv2: partial(nn.LayerNorm, eps=1e-6)
                name=f"block{i}",
            )(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)

        n_prefix = 1 + self.num_registers
        return {
            "x_norm_clstoken": tokens[:, 0],
            "x_norm_regtokens": tokens[:, 1:n_prefix],
            "x_norm_patchtokens": tokens[:, n_prefix:],
            "grid": (gh, gw),
        }
