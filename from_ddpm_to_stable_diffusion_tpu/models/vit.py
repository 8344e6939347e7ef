"""Vision Transformer classifier (stage 04 capability).

The reference imports ``vit_pytorch.ViT`` rather than implementing one
(/root/reference/04_vision_transformer/01_train_classification.py:2,17-21);
per SURVEY.md §3.5 the framework supplies its own. Standard ViT: conv
patchify, class token, learned positions, pre-LN transformer blocks, MLP
head — with the stage-04 config surface (image 128, patch 32, dim 512,
depth 6, heads 8, mlp_dim 1024, 3 classes, dropout/emb_dropout 0.1).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, SelfAttention

Dtype = Any


class ViTBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        h = LayerNorm(name="ln1")(x)
        h = SelfAttention(self.num_heads, qkv_bias=True, dtype=self.dtype,
                          name="attn")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = LayerNorm(name="ln2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class ViT(nn.Module):
    image_size: int = 128
    patch_size: int = 32
    num_classes: int = 3
    dim: int = 512
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 1024
    dropout: float = 0.1
    emb_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_features: bool = False):
        """x: (B, H, W, 3) -> logits (B, num_classes).

        ``return_features=True`` returns the penultimate representation
        instead — the post-``ln_final`` CLS vector (B, dim) — used as the
        KID/FID featurizer when no pretrained InceptionV3/CLIP exists in
        the environment (utils/metrics.py consumers, QUALITY.md)."""
        assert self.image_size % self.patch_size == 0
        p = self.patch_size
        b = x.shape[0]
        h = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        h = h.reshape(b, -1, self.dim)  # (B, N, D)
        n = h.shape[1]

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim))
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(h.dtype), h],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n + 1, self.dim))
        h = h + pos.astype(h.dtype)
        h = nn.Dropout(self.emb_dropout)(h, deterministic=deterministic)

        for i in range(self.depth):
            h = ViTBlock(self.heads, self.mlp_dim, self.dropout,
                         dtype=self.dtype, name=f"block{i}")(h, deterministic)

        h = LayerNorm(name="ln_final")(h[:, 0])
        if return_features:
            return h.astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="head")(h.astype(jnp.float32))
