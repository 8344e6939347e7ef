"""Shared Flax building blocks for the diffusion model zoo.

These are the L2 ops of SURVEY.md §1 re-designed NHWC/TPU-first:
GroupNorm+SiLU ResBlocks, self/cross attention with fused QKV, GEGLU
transformer blocks, timestep/label embedders, nearest-×2 upsample.

Structural parity targets (no code shared — see module docstrings):
- SelfAttention/CrossAttention: 01_.../stable_diffusion_pytorch/attention.py:7-70,
  06_tiny_stable_diffusion/diffusion.py:40-82
- ResidualBlock / AttentionBlock / UpSample / switch container:
  06_.../diffusion.py:85-180, 01_.../diffusion.py:7-130
- TimestepEmbedder: 06_.../diffusion.py:13-37, 02_.../mmdit.py:58-97
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import embeddings as emb_ops
from ..ops.attention import multi_head_attention
from ..ops.groupnorm import group_norm, layer_norm
from ..ops.image import upsample_nearest_2x
from ..ops.quantize import dense_cls as _dense_cls

Dtype = Any


class GroupNorm(nn.Module):
    """Parameter-owning wrapper over the functional fp32-stats group norm."""

    num_groups: int = 32
    eps: float = 1e-5
    act: Optional[str] = None  # 'silu' fuses the activation

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, self.num_groups, scale, bias, self.eps, self.act)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics (matches torch nn.LayerNorm)."""

    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = (self.param("scale", nn.initializers.ones, (c,))
                 if self.use_scale else None)
        bias = (self.param("bias", nn.initializers.zeros, (c,))
                if self.use_bias else None)
        return layer_norm(x, scale, bias, self.eps)


class SelfAttention(nn.Module):
    """Fused-QKV multi-head self attention over (B, L, C) tokens."""

    num_heads: int
    qkv_bias: bool = False
    out_bias: bool = True
    causal: bool = False
    dtype: Dtype = jnp.float32
    int8_mm: bool = False   # W8A8 serving path (ops/quantize.py)

    @nn.compact
    def __call__(self, x, bias=None):
        dense = _dense_cls(self.int8_mm)
        c = x.shape[-1]
        qkv = dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = multi_head_attention(q, k, v, self.num_heads, bias=bias,
                                   causal=self.causal)
        return dense(c, use_bias=self.out_bias, dtype=self.dtype,
                     name="out")(out)


class CrossAttention(nn.Module):
    """Query from x (B, Lq, C); key/value from context (B, Lk, d_cross)."""

    num_heads: int
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32
    int8_mm: bool = False

    @nn.compact
    def __call__(self, x, context):
        dense = _dense_cls(self.int8_mm)
        c = x.shape[-1]
        if context.ndim == 2:  # single context token (tiny-UNet label emb)
            context = context[:, None, :]
        q = dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
        k = dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(context)
        v = dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(context)
        out = multi_head_attention(q, k, v, self.num_heads)
        return dense(c, use_bias=True, dtype=self.dtype, name="out")(out)


class TimestepEmbedder(nn.Module):
    """Sinusoidal features -> 2-layer SiLU MLP."""

    hidden_size: int
    freq_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        x = emb_ops.timestep_embedding(t, self.freq_dim, dtype=self.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)


class LabelEmbedder(nn.Module):
    """Class-label embedding with index 0 = unconditional (zero row).

    Embedding row 0 acts as torch's padding_idx=0: frozen at zero so the
    CFG unconditional branch sees a true null embedding.
    """

    num_classes: int
    d_model: int = 256
    hidden_size: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels):
        table = nn.Embed(self.num_classes + 1, self.d_model,
                         dtype=self.dtype, name="table")(labels)
        table = table * (labels != 0)[..., None].astype(table.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(table)
        x = jax.nn.silu(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)


class ResBlock(nn.Module):
    """GN+SiLU conv block with additive time conditioning and skip 1×1."""

    out_channels: int
    dropout: float = 0.0
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb, deterministic: bool = True):
        h = GroupNorm(self.num_groups, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_proj")(
            jax.nn.silu(time_emb))
        h = h + t[:, None, None, :]
        h = GroupNorm(self.num_groups, act="silu", name="norm2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return h + x


class TransformerBlock(nn.Module):
    """Spatial transformer: GN → 1×1 in → self-attn → cross-attn → GEGLU → 1×1 out.

    Operates on NHWC; tokens are the H·W positions. Long residual around the
    whole block, short residuals around each sub-layer.

    ``num_heads=None`` derives heads from ``head_dim`` (TPU-native default:
    the MXU contracts 128 lanes per pass, so head_dim < 128 pads the
    attention matmuls — 8 heads over 128 channels wastes 8× the FLOPs).
    Models that import reference checkpoints pass the reference head count
    explicitly.
    """

    num_heads: Optional[int] = None
    head_dim: int = 128
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    int8_mm: bool = False

    @nn.compact
    def __call__(self, x, context, deterministic: bool = True):
        b, h, w, c = x.shape
        heads = self.num_heads or max(1, c // self.head_dim)
        residue_long = x
        y = GroupNorm(32, eps=1e-6, name="norm_in")(x)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, c)

        y = SelfAttention(heads, dtype=self.dtype, name="attn1",
                          int8_mm=self.int8_mm)(
            LayerNorm(name="norm1")(y)) + y
        y = CrossAttention(heads, dtype=self.dtype, name="attn2",
                           int8_mm=self.int8_mm)(
            LayerNorm(name="norm2")(y), context) + y

        z = LayerNorm(name="norm3")(y)
        dense = _dense_cls(self.int8_mm)
        z = dense(8 * c, dtype=self.dtype, name="geglu_in")(z)
        z, gate = jnp.split(z, 2, axis=-1)
        z = z * jax.nn.gelu(gate)
        z = dense(c, dtype=self.dtype, name="geglu_out")(z)
        y = y + z

        y = y.reshape(b, h, w, c)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(y)
        return y + residue_long


class Upsample(nn.Module):
    """Nearest ×2 + 3×3 conv."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        return nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype, name="conv")(x)
