"""SigLIP vision tower (stage 05 capability).

TPU-native re-design of /root/reference/05_clip/model_siglip.py:35-235:
conv patchify (VALID, stride = patch), learned per-patch position table (no
class token), pre-LN transformer with gelu-tanh MLP, final LN. Returns the
full patch-token sequence (B, N, D) like the reference's VisionModel.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, SelfAttention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_channels: int = 3
    image_size: int = 224
    patch_size: int = 16
    layer_norm_eps: float = 1e-6


class SiglipEncoderLayer(nn.Module):
    config: SiglipVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = LayerNorm(eps=cfg.layer_norm_eps, name="ln1")(x)
        h = SelfAttention(cfg.num_attention_heads, qkv_bias=True,
                          dtype=self.dtype, name="attn")(h)
        x = x + h
        h = LayerNorm(eps=cfg.layer_norm_eps, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=True)  # gelu-tanh
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class SiglipVisionModel(nn.Module):
    config: SiglipVisionConfig = SiglipVisionConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> patch states (B, N, hidden)."""
        cfg = self.config
        p = cfg.patch_size
        b = x.shape[0]
        h = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype,
                    name="patch_embedding")(x.astype(self.dtype))
        h = h.reshape(b, -1, cfg.hidden_size)
        n = h.shape[1]
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (n, cfg.hidden_size))
        h = h + pos.astype(h.dtype)
        for i in range(cfg.num_hidden_layers):
            h = SiglipEncoderLayer(cfg, dtype=self.dtype,
                                   name=f"layer{i}")(h)
        return LayerNorm(eps=cfg.layer_norm_eps, name="post_ln")(h)
