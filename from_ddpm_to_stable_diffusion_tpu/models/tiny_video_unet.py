"""Tiny class-conditional VIDEO diffusion UNet (stage-08 capability,
TPU-native).

The reference's video stage is a 27-line diffusers library call
(/root/reference/08_video/01_check.py:1-27 — CogVideoX via pipeline); this
module provides an actually-trainable text→video-class analogue built the
TPU way: **factorized space/time attention** over (B, T, H, W, C) clips —

- all 2-D ops (convs, GroupNorm, spatial attention) run with frames folded
  into the batch (B·T, H, W, C): one big MXU stream, no new kernels;
- temporal attention runs with spatial positions folded into the batch
  (B·H·W, T, C): T is tiny (8–16), so this is a batched small matmul XLA
  handles natively — the classic VDM/ST-DiT factorization that avoids a
  (T·H·W)² joint attention entirely;
- downsampling is spatial-only; every frame shares weights (temporal
  structure is learned ONLY through the temporal-attention layers, so the
  model collapses to per-frame TinyUNet behavior when they are identity).

Trains with the same rank-generic q-sample/DDPM machinery as stage 06
(samplers/ddpm.py) via ``DDPMTrainer(model=..., sample_shape=...)``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import embeddings as emb_ops
from .layers import (GroupNorm, LabelEmbedder, ResBlock, SelfAttention,
                     TimestepEmbedder, TransformerBlock, Upsample)

Dtype = Any


class TemporalAttention(nn.Module):
    """Self-attention over the frame axis at every spatial position.

    Input (B, T, H, W, C); spatial positions fold into the batch so the
    sequence length is just T. Sinusoidal frame-position features are
    added to the tokens (frames are otherwise permutation-invariant).
    """

    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        pos = emb_ops.timestep_embedding(jnp.arange(t), c,
                                         dtype=self.dtype)   # (T, C)
        y = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        y = y + pos[None, :, :]
        from .layers import LayerNorm

        y = SelfAttention(self.num_heads, dtype=self.dtype, name="attn")(
            LayerNorm(name="norm")(y))
        y = y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
        return x + y


class TinyVideoUNet(nn.Module):
    """Predicts ε for clip x_t given (diffusion step t, class label)."""

    out_channels: int = 3
    base_channels: int = 64
    channel_mult: Sequence[int] = (1, 2, 2)
    num_classes: int = 10
    dropout: float = 0.0
    time_emb_dim: int = 256
    temporal_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, labels, deterministic: bool = True):
        """x: (B, T, H, W, C); t: (B,); labels: (B,)."""
        b, nt, h, w, cin = x.shape
        mult = [self.base_channels * m for m in self.channel_mult]
        dt = self.dtype

        time = TimestepEmbedder(self.time_emb_dim, 256, dtype=dt,
                                name="time_embedding")(t)
        context = LabelEmbedder(self.num_classes, 128, self.time_emb_dim,
                                dtype=dt, name="label_embedding")(labels)
        # per-frame conditioning: frames share the clip's (t, label)
        time_f = jnp.repeat(time, nt, axis=0)          # (B·T, D)
        ctx_f = jnp.repeat(context, nt, axis=0)

        fold = lambda v: v.reshape(b * nt, *v.shape[2:])
        unfold = lambda v: v.reshape(b, nt, *v.shape[1:])
        res = lambda c, nm: ResBlock(c, self.dropout, dtype=dt, name=nm)
        att = lambda nm: TransformerBlock(None, dtype=dt, name=nm)
        tatt = lambda nm: TemporalAttention(self.temporal_heads, dtype=dt,
                                            name=nm)

        s = fold(x.astype(dt))
        skips = []
        s = nn.Conv(mult[0], (3, 3), dtype=dt, name="enc0_conv")(s)
        s = res(mult[0], "enc1_res")(s, time_f, deterministic)
        s = att("enc1_att")(s, ctx_f, deterministic)
        s = fold(tatt("enc1_tatt")(unfold(s)))
        skips.append(s)
        s = nn.Conv(mult[1], (3, 3), strides=2, dtype=dt, name="enc2_down")(s)
        s = res(mult[1], "enc3_res")(s, time_f, deterministic)
        s = att("enc3_att")(s, ctx_f, deterministic)
        s = fold(tatt("enc3_tatt")(unfold(s)))
        skips.append(s)
        s = nn.Conv(mult[2], (3, 3), strides=2, dtype=dt, name="enc4_down")(s)
        s = res(mult[2], "enc5_res")(s, time_f, deterministic)
        skips.append(s)

        s = res(mult[2], "mid_res1")(s, time_f, deterministic)
        s = att("mid_att")(s, ctx_f, deterministic)
        s = fold(tatt("mid_tatt")(unfold(s)))
        s = res(mult[2], "mid_res2")(s, time_f, deterministic)

        cat = lambda a: jnp.concatenate([a, skips.pop()], axis=-1)
        s = res(mult[2], "dec0_res")(cat(s), time_f, deterministic)
        s = Upsample(dtype=dt, name="dec0_up")(s)
        s = res(mult[1], "dec1_res")(cat(s), time_f, deterministic)
        s = att("dec1_att")(s, ctx_f, deterministic)
        s = fold(tatt("dec1_tatt")(unfold(s)))
        s = Upsample(dtype=dt, name="dec1_up")(s)
        s = res(mult[0], "dec2_res")(cat(s), time_f, deterministic)
        s = att("dec2_att")(s, ctx_f, deterministic)
        s = fold(tatt("dec2_tatt")(unfold(s)))

        s = GroupNorm(16, act="silu", name="tail_norm")(s)
        s = nn.Conv(self.out_channels, (3, 3), dtype=dt,
                    name="tail_conv")(s)
        return unfold(s).astype(jnp.float32)
