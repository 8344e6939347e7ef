"""Class-conditional tiny diffusion UNet (stage 06 capability).

TPU-native re-design of the reference's trainable DDPM backbone
(/root/reference/06_tiny_stable_diffusion/diffusion.py:183-276): same
topology — channel ladder base·[1,2,2,2] over 64×64, 8 encoder stages with
skip-concat, attention bottleneck, 8 decoder stages, GN+SiLU tail — but NHWC,
Flax, with fused-QKV attention and fp32-stat norms, all dtype-polymorphic so
training runs bf16 on the MXU.

Conditioning: sinusoidal timestep MLP (d_freq=256 → 512) + class-label
embedding (index 0 = CFG unconditional null, reference diffusion.py:196-201),
cross-attended as a single context token inside each TransformerBlock.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (GroupNorm, LabelEmbedder, ResBlock, TimestepEmbedder,
                     TransformerBlock, Upsample)

Dtype = Any


class TinyUNet(nn.Module):
    """Predicts ε for x_t given (t, class label)."""

    out_channels: int = 3
    base_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    num_classes: int = 10
    dropout: float = 0.0
    time_emb_dim: int = 512
    # None → heads derived per block from a 128 head_dim target (MXU-native);
    # the reference uses 8 heads (head_dim 16-64), wasteful on TPU lanes.
    num_heads: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, labels, deterministic: bool = True):
        """x: (B, H, W, C) NHWC; t: (B,) int/float; labels: (B,) int."""
        mult = [self.base_channels * m for m in self.channel_mult]
        dt = self.dtype

        time = TimestepEmbedder(self.time_emb_dim, 256, dtype=dt,
                                name="time_embedding")(t)
        context = LabelEmbedder(self.num_classes, 256, self.time_emb_dim,
                                dtype=dt, name="label_embedding")(labels)

        res = lambda c, nm: ResBlock(c, self.dropout, dtype=dt, name=nm)
        att = lambda nm: TransformerBlock(self.num_heads, dtype=dt, name=nm)

        x = x.astype(dt)
        skips = []

        # --- encoder (stage shapes for 64×64 in trailing comments) ---
        h = nn.Conv(mult[0], (3, 3), dtype=dt, name="enc0_conv")(x)       # 64² m0
        skips.append(h)
        h = res(mult[0], "enc1_res")(h, time, deterministic)
        h = att("enc1_att")(h, context, deterministic)                     # 64² m0
        skips.append(h)
        h = nn.Conv(mult[0], (3, 3), strides=2, dtype=dt, name="enc2_down")(h)  # 32²
        skips.append(h)
        h = res(mult[1], "enc3_res")(h, time, deterministic)
        h = att("enc3_att")(h, context, deterministic)                     # 32² m1
        skips.append(h)
        h = nn.Conv(mult[1], (3, 3), strides=2, dtype=dt, name="enc4_down")(h)  # 16²
        skips.append(h)
        h = res(mult[2], "enc5_res")(h, time, deterministic)
        h = att("enc5_att")(h, context, deterministic)                     # 16² m2
        skips.append(h)
        h = nn.Conv(mult[2], (3, 3), strides=2, dtype=dt, name="enc6_down")(h)  # 8²
        skips.append(h)
        h = res(mult[3], "enc7_res")(h, time, deterministic)               # 8² m3
        skips.append(h)

        # --- bottleneck ---
        h = res(mult[3], "mid_res1")(h, time, deterministic)
        h = att("mid_att")(h, context, deterministic)
        h = res(mult[3], "mid_res2")(h, time, deterministic)

        # --- decoder (skip-concat then block stack, mirroring encoder) ---
        cat = lambda a: jnp.concatenate([a, skips.pop()], axis=-1)
        h = res(mult[2], "dec0_res")(cat(h), time, deterministic)          # 8²
        h = res(mult[2], "dec1_res")(cat(h), time, deterministic)
        h = Upsample(dtype=dt, name="dec1_up")(h)                          # 16²
        h = res(mult[1], "dec2_res")(cat(h), time, deterministic)
        h = att("dec2_att")(h, context, deterministic)
        h = res(mult[1], "dec3_res")(cat(h), time, deterministic)
        h = att("dec3_att")(h, context, deterministic)
        h = Upsample(dtype=dt, name="dec3_up")(h)                          # 32²
        h = res(mult[0], "dec4_res")(cat(h), time, deterministic)
        h = att("dec4_att")(h, context, deterministic)
        h = res(mult[0], "dec5_res")(cat(h), time, deterministic)
        h = att("dec5_att")(h, context, deterministic)
        h = Upsample(dtype=dt, name="dec5_up")(h)                          # 64²

        h = res(mult[0], "dec6_res")(cat(h), time, deterministic)
        h = att("dec6_att")(h, context, deterministic)
        h = res(mult[0], "dec7_res")(cat(h), time, deterministic)
        h = att("dec7_att")(h, context, deterministic)

        h = GroupNorm(32, act="silu", name="tail_norm")(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=dt, name="tail_conv")(h)
        return h.astype(jnp.float32)
