"""SD3 text-encoder family: CLIP-L / CLIP-G with hidden-layer taps, T5-XXL.

TPU-native re-design of /root/reference/02_stable_diffusion-3/utils.py:
- CLIP text stack with ``intermediate_output`` tap (:77-126), causal mask
  built at forward (:154), argmax-EOS pooling through an identity-init
  text_projection (:159-172). CLIP-L uses QuickGELU + hidden layer −2;
  CLIP-G (SDXLClipG) uses GELU + penultimate layer, no LN on hidden
  (:261-326).
- T5-XXL encoder (:345-536): RMS-style T5LayerNorm, gated gelu-tanh FF,
  UNSCALED attention logits (Mesh-TF convention — the reference pre-scales
  k by √head_dim to cancel the SDPA 1/√d, :468; here ``scale=1.0``),
  relative-position bucket bias computed in layer 0 and shared as
  ``past_bias`` by all layers (:484-536). Bucket math is pure jnp (jittable).
- ``SD3CondAssembler.get_cond`` rebuilds the exact context assembly of
  sd3_infer.py:279-309: (77,768)+(77,1280) → pad 4096 → concat T5 (77,4096)
  ⇒ (154, 4096); pooled = l‖g ⇒ (2048,).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import multi_head_attention
from ..ops.groupnorm import rms_norm
from .layers import LayerNorm, SelfAttention

Dtype = Any


from ..ops.quantize import dense_cls as _dense_cls  # noqa: E402


# --------------------------------------------------------------------------
# Generic CLIP text model with intermediate tap
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    hidden_act: str = "quick_gelu"  # quick_gelu | gelu


CLIP_L_CONFIG = CLIPTextConfig()
CLIP_G_CONFIG = CLIPTextConfig(hidden_size=1280, num_layers=32, num_heads=20,
                               hidden_act="gelu")


class CLIPTextLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = LayerNorm(name="ln1")(x)
        h = SelfAttention(cfg.num_heads, qkv_bias=True, causal=True,
                          dtype=self.dtype, name="attn")(h)
        x = x + h
        h = LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * cfg.hidden_size, dtype=self.dtype, name="fc1")(h)
        if cfg.hidden_act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden, intermediate_hidden, pooled_projected)."""

    config: CLIPTextConfig = CLIP_L_CONFIG
    intermediate_output: Optional[int] = None  # e.g. -2 for penultimate
    ln_intermediate: bool = False  # apply final LN to the tapped hidden
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (cfg.max_positions, cfg.hidden_size))
        x = x + pos.astype(x.dtype)

        tap = (self.intermediate_output % cfg.num_layers
               if self.intermediate_output is not None else None)
        intermediate = None
        for i in range(cfg.num_layers):
            x = CLIPTextLayer(cfg, dtype=self.dtype, name=f"layer{i}")(x)
            if tap is not None and i == tap:
                intermediate = x
        final_ln = LayerNorm(name="ln_final")
        x = final_ln(x)
        if intermediate is not None and self.ln_intermediate:
            intermediate = final_ln(intermediate)

        # pooled: state at the EOS position (highest token id), projected
        eos = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos]
        proj = self.param(
            "text_projection",
            lambda key, shape: jnp.eye(shape[0], dtype=jnp.float32),
            (cfg.hidden_size, cfg.hidden_size))
        pooled = pooled.astype(jnp.float32) @ proj
        return x, intermediate, pooled


# --------------------------------------------------------------------------
# T5-XXL encoder
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    # W8A8 int8 projections (serving residency: T5-XXL 9.5→4.8 GiB, the
    # enabler for the all-resident SD3 mode — docs/SD3_16GB.md). Params
    # must come from ops.quantize.quantize_tree. Caveat: T5-XXL-scale
    # activation outliers can stress per-token symmetric quantization;
    # validate against real weights before production use.
    int8_mm: bool = False


def t5_relative_position_bucket(relative_position, num_buckets: int = 32,
                                max_distance: int = 128):
    """Bidirectional Mesh-TF bucket map, pure jnp (utils.py:401-443)."""
    num_buckets //= 2
    buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rel = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, rel_large)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, past_bias=None):
        cfg = self.config
        dense = _dense_cls(cfg.int8_mm)
        inner = cfg.d_model
        q = dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        if self.has_relative_bias:
            L = x.shape[1]
            rel = (jnp.arange(L)[None, :] - jnp.arange(L)[:, None])
            bucket = t5_relative_position_bucket(
                rel, cfg.rel_buckets, cfg.rel_max_distance)
            table = self.param("relative_attention_bias",
                               nn.initializers.normal(1.0),
                               (cfg.rel_buckets, cfg.num_heads))
            past_bias = jnp.transpose(table[bucket], (2, 0, 1))[None]
        out = multi_head_attention(q, k, v, cfg.num_heads, bias=past_bias,
                                   scale=1.0)  # T5: unscaled logits
        return (dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                      name="o")(out), past_bias)


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, past_bias=None):
        cfg = self.config
        scale1 = self.param("ln1_scale", nn.initializers.ones, (cfg.d_model,))
        h, past_bias = T5Attention(cfg, self.has_relative_bias,
                                   dtype=self.dtype, name="attn")(
            rms_norm(x, scale1, eps=1e-6), past_bias)
        x = x + h
        scale2 = self.param("ln2_scale", nn.initializers.ones, (cfg.d_model,))
        h = rms_norm(x, scale2, eps=1e-6)
        dense = _dense_cls(cfg.int8_mm)
        gelu = jax.nn.gelu(
            dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                  name="wi_0")(h), approximate=True)
        linear = dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                       name="wi_1")(h)
        h = dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                  name="wo")(gelu * linear)
        return x + h, past_bias


class T5Encoder(nn.Module):
    config: T5Config = T5Config()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     name="embed_tokens")(tokens)
        past_bias = None
        for i in range(cfg.num_layers):
            x, past_bias = T5Block(cfg, has_relative_bias=(i == 0),
                                   dtype=self.dtype,
                                   name=f"block{i}")(x, past_bias)
        scale = self.param("final_ln_scale", nn.initializers.ones,
                           (cfg.d_model,))
        return rms_norm(x, scale, eps=1e-6)


# --------------------------------------------------------------------------
# SD3 conditioning assembly
# --------------------------------------------------------------------------
def assemble_sd3_cond(l_hidden, l_pooled, g_hidden, g_pooled, t5_out):
    """(77,768)+(77,1280) → pad 4096 → ‖ T5 (77,4096) ⇒ context (154,4096);
    pooled = l‖g ⇒ (2048,). Shapes per sd3_infer.py:285-309."""
    lg = jnp.concatenate([l_hidden, g_hidden], axis=-1)  # (B, 77, 2048)
    pad = jnp.zeros(lg.shape[:-1] + (4096 - lg.shape[-1],), lg.dtype)
    lg = jnp.concatenate([lg, pad], axis=-1)             # (B, 77, 4096)
    context = jnp.concatenate([lg, t5_out.astype(lg.dtype)], axis=1)
    pooled = jnp.concatenate([l_pooled, g_pooled], axis=-1)  # (B, 2048)
    return context, pooled
