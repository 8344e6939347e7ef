"""Stable Diffusion 1 model family: CLIP text encoder, UNet, VAE.

TPU-native re-design of /root/reference/01_stable_diffusion-1/
stable_diffusion_pytorch/{clip,diffusion,encoder,decoder}.py. Topology and
tensor-shape contracts match the reference exactly (so its checkpoints import
cleanly and goldens compare); the implementation is NHWC Flax with fused-QKV
flash attention, fp32-stat GroupNorm, and dtype-polymorphic compute.

Key structural facts preserved:
- CLIP (clip.py:7-60): vocab 49408, 77 learned positions, 12 layers,
  12 heads, 768d, causal self-attention, QuickGELU (x·σ(1.702x)), final LN.
- UNet (diffusion.py:110-205): time 320→1280 MLP; channel ladder
  320/640/1280; 12 encoder stages (skip push), bottleneck, 12 decoder
  stages (skip concat); AttentionBlock = GN(1e-6)+1×1 conv → self-attn →
  cross-attn(d_context 768) → GEGLU → 1×1 conv, all with short residuals
  and one long residual; Final GN+SiLU+conv to 4 channels.
- VAE (encoder.py:7-44, decoder.py:7-91): 128/256/512 ladder; stride-2
  convs with ASYMMETRIC (0,1,0,1) padding in the encoder; mid 1-head
  attention over h·w tokens; latent scale 0.18215; encoder emits
  mean/log_var (clamped [−30, 20]) and reparameterizes with caller noise.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm, LayerNorm, SelfAttention, TransformerBlock

Dtype = Any

SD1_LATENT_SCALE = 0.18215


# --------------------------------------------------------------------------
# CLIP text encoder (123M)
# --------------------------------------------------------------------------
class CLIPTextLayer(nn.Module):
    num_heads: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = LayerNorm(name="ln1")(x)
        h = SelfAttention(self.num_heads, qkv_bias=True, causal=True,
                          dtype=self.dtype, name="attn")(h)
        x = x + h
        h = LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPText(nn.Module):
    """SD1 text tower: token ids (B, 77) -> penultimate-LN states (B, 77, 768)."""

    vocab_size: int = 49408
    num_positions: int = 77
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        x = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param("position_value", nn.initializers.zeros,
                         (self.num_positions, self.embed_dim))
        x = x + pos.astype(x.dtype)
        for i in range(self.num_layers):
            x = CLIPTextLayer(self.num_heads, dtype=self.dtype,
                              name=f"layer{i}")(x)
        return LayerNorm(name="ln_final")(x)


# --------------------------------------------------------------------------
# Diffusion UNet (860M)
# --------------------------------------------------------------------------
class SD1ResBlock(nn.Module):
    """GN+SiLU+conv, additive time, GN+SiLU+conv, 1×1 skip (diffusion.py:20-50)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb):
        h = GroupNorm(32, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_proj")(
            jax.nn.silu(time_emb))
        h = h + t[:, None, None, :]
        h = GroupNorm(32, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return h + x


class SD1UNet(nn.Module):
    """ε-prediction UNet. x: (B, H/8, W/8, 4) NHWC; context: (B, 77, 768)."""

    model_channels: int = 320
    context_dim: int = 768
    num_heads: int = 8
    dtype: Dtype = jnp.float32
    int8_mm: bool = False   # W8A8 attention/GEGLU projections (serving)

    @nn.compact
    def __call__(self, x, context, time_feat):
        """time_feat: (B, 320) sd1_time_embedding features (pre-MLP)."""
        dt = self.dtype
        ch = self.model_channels  # 320

        # time MLP 320 -> 1280
        t = nn.Dense(4 * ch, dtype=dt, name="time_fc1")(
            time_feat.astype(dt))
        t = jax.nn.silu(t)
        t = nn.Dense(4 * ch, dtype=dt, name="time_fc2")(t)

        res = lambda c, nm: SD1ResBlock(c, dtype=dt, name=nm)
        att = lambda nm: TransformerBlock(self.num_heads, dtype=dt, name=nm,
                                          int8_mm=self.int8_mm)
        # stride-2 downsample: the reference uses torch padding=1, i.e.
        # SYMMETRIC (1,1) — NOT XLA 'SAME', which pads (0,1) on even sizes
        # and mis-aligns every window (caught by test_reference_parity).
        down = lambda c, nm: nn.Conv(c, (3, 3), strides=2,
                                     padding=((1, 1), (1, 1)), dtype=dt,
                                     name=nm)
        up = lambda nm: nm  # placeholder for readability

        x = x.astype(dt)
        skips = []

        def push(h):
            skips.append(h)
            return h

        # encoders (12 stages, diffusion.py:133-146)
        h = push(nn.Conv(ch, (3, 3), dtype=dt, name="enc0_conv")(x))
        h = push(att("enc1_att")(res(ch, "enc1_res")(h, t), context))
        h = push(att("enc2_att")(res(ch, "enc2_res")(h, t), context))
        h = push(down(ch, "enc3_down")(h))
        h = push(att("enc4_att")(res(2 * ch, "enc4_res")(h, t), context))
        h = push(att("enc5_att")(res(2 * ch, "enc5_res")(h, t), context))
        h = push(down(2 * ch, "enc6_down")(h))
        h = push(att("enc7_att")(res(4 * ch, "enc7_res")(h, t), context))
        h = push(att("enc8_att")(res(4 * ch, "enc8_res")(h, t), context))
        h = push(down(4 * ch, "enc9_down")(h))
        h = push(res(4 * ch, "enc10_res")(h, t))
        h = push(res(4 * ch, "enc11_res")(h, t))

        # bottleneck
        h = res(4 * ch, "mid_res1")(h, t)
        h = att("mid_att")(h, context)
        h = res(4 * ch, "mid_res2")(h, t)

        # decoders (12 stages, diffusion.py:152-165)
        from .layers import Upsample

        cat = lambda a: jnp.concatenate([a, skips.pop()], axis=-1)
        h = res(4 * ch, "dec0_res")(cat(h), t)
        h = res(4 * ch, "dec1_res")(cat(h), t)
        h = Upsample(dtype=dt, name="dec2_up")(res(4 * ch, "dec2_res")(cat(h), t))
        h = att("dec3_att")(res(4 * ch, "dec3_res")(cat(h), t), context)
        h = att("dec4_att")(res(4 * ch, "dec4_res")(cat(h), t), context)
        h = Upsample(dtype=dt, name="dec5_up")(
            att("dec5_att")(res(4 * ch, "dec5_res")(cat(h), t), context))
        h = att("dec6_att")(res(2 * ch, "dec6_res")(cat(h), t), context)
        h = att("dec7_att")(res(2 * ch, "dec7_res")(cat(h), t), context)
        h = Upsample(dtype=dt, name="dec8_up")(
            att("dec8_att")(res(2 * ch, "dec8_res")(cat(h), t), context))
        h = att("dec9_att")(res(ch, "dec9_res")(cat(h), t), context)
        h = att("dec10_att")(res(ch, "dec10_res")(cat(h), t), context)
        h = att("dec11_att")(res(ch, "dec11_res")(cat(h), t), context)

        # final layer (diffusion.py:183-192)
        h = GroupNorm(32, act="silu", name="final_norm")(h)
        h = nn.Conv(4, (3, 3), dtype=dt, name="final_conv")(h)
        return h.astype(jnp.float32)


# --------------------------------------------------------------------------
# VAE
# --------------------------------------------------------------------------
class VAEResBlock(nn.Module):
    """GN+SiLU+conv ×2 with 1×1 skip (decoder.py:28-53) — no time input."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(32, act="silu", name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm(32, act="silu", name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return h + x


class VAEAttentionBlock(nn.Module):
    """GN + 1-head self-attention over h·w tokens (decoder.py:7-25)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm(32, name="norm")(x)
        y = y.reshape(b, h * w, c)
        y = SelfAttention(1, qkv_bias=True, dtype=self.dtype,
                          name="attn")(y)
        return x + y.reshape(b, h, w, c)


def _downsample_conv(features, dtype, name):
    """Stride-2 conv with the reference's asymmetric (0,1,0,1) pad
    (encoder.py:33-34): pad right/bottom only, VALID conv."""
    return nn.Conv(features, (3, 3), strides=(2, 2),
                   padding=((0, 1), (0, 1)), dtype=dtype, name=name)


class VAEEncoder(nn.Module):
    """Image (B, H, W, 3) in [−1,1] + noise (B, H/8, W/8, 4) -> scaled latent."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, noise):
        dt = self.dtype
        h = nn.Conv(128, (3, 3), dtype=dt, name="conv_in")(x.astype(dt))
        h = VAEResBlock(128, dtype=dt, name="res0")(h)
        h = VAEResBlock(128, dtype=dt, name="res1")(h)
        h = _downsample_conv(128, dt, "down0")(h)
        h = VAEResBlock(256, dtype=dt, name="res2")(h)
        h = VAEResBlock(256, dtype=dt, name="res3")(h)
        h = _downsample_conv(256, dt, "down1")(h)
        h = VAEResBlock(512, dtype=dt, name="res4")(h)
        h = VAEResBlock(512, dtype=dt, name="res5")(h)
        h = _downsample_conv(512, dt, "down2")(h)
        h = VAEResBlock(512, dtype=dt, name="res6")(h)
        h = VAEResBlock(512, dtype=dt, name="res7")(h)
        h = VAEResBlock(512, dtype=dt, name="res8")(h)
        h = VAEAttentionBlock(dtype=dt, name="mid_attn")(h)
        h = VAEResBlock(512, dtype=dt, name="res9")(h)
        h = GroupNorm(32, act="silu", name="norm_out")(h)
        h = nn.Conv(8, (3, 3), dtype=dt, name="conv_out")(h)
        h = nn.Conv(8, (1, 1), dtype=dt, name="conv_quant")(h)

        mean, log_var = jnp.split(h.astype(jnp.float32), 2, axis=-1)
        log_var = jnp.clip(log_var, -30.0, 20.0)
        std = jnp.exp(0.5 * log_var)
        z = mean + std * noise.astype(jnp.float32)
        return z * SD1_LATENT_SCALE


class VAEDecoder(nn.Module):
    """Scaled latent (B, H/8, W/8, 4) -> image (B, H, W, 3) in [−1,1]."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        from ..ops.image import upsample_nearest_2x

        dt = self.dtype
        h = (z / SD1_LATENT_SCALE).astype(dt)
        h = nn.Conv(4, (1, 1), dtype=dt, name="conv_in1")(h)
        h = nn.Conv(512, (3, 3), dtype=dt, name="conv_in2")(h)
        h = VAEResBlock(512, dtype=dt, name="res0")(h)
        h = VAEAttentionBlock(dtype=dt, name="mid_attn")(h)
        for i in range(1, 5):
            h = VAEResBlock(512, dtype=dt, name=f"res{i}")(h)
        h = upsample_nearest_2x(h)
        h = nn.Conv(512, (3, 3), dtype=dt, name="up0_conv")(h)
        for i in range(5, 8):
            h = VAEResBlock(512, dtype=dt, name=f"res{i}")(h)
        h = upsample_nearest_2x(h)
        h = nn.Conv(512, (3, 3), dtype=dt, name="up1_conv")(h)
        h = VAEResBlock(256, dtype=dt, name="res8")(h)
        h = VAEResBlock(256, dtype=dt, name="res9")(h)
        h = VAEResBlock(256, dtype=dt, name="res10")(h)
        h = upsample_nearest_2x(h)
        h = nn.Conv(256, (3, 3), dtype=dt, name="up2_conv")(h)
        h = VAEResBlock(128, dtype=dt, name="res11")(h)
        h = VAEResBlock(128, dtype=dt, name="res12")(h)
        h = VAEResBlock(128, dtype=dt, name="res13")(h)
        h = GroupNorm(32, act="silu", name="norm_out")(h)
        h = nn.Conv(3, (3, 3), dtype=dt, name="conv_out")(h)
        return h.astype(jnp.float32)
