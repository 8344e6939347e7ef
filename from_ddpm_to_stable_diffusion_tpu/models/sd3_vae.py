"""SD3 16-channel VAE (stage 02 capability).

TPU-native re-design of /root/reference/02_stable_diffusion-3/utils.py:539-752:
ch=128, mult (1,2,4,4), 2 res blocks per level (3 in the decoder), mid
ResNet/Attn/ResNet, z=16; encoder downsamples with the asymmetric (0,1,0,1)
pad; encode = mean + std·noise with log_var clamped [−30, 20]. NHWC, fp32
norm statistics, explicit PRNG noise. Latent shift/scale live in
:class:`SD3LatentFormat` (sd3_infer.py:140-172).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.image import upsample_nearest_2x
from .layers import GroupNorm
from .sd1 import VAEAttentionBlock, VAEResBlock, _downsample_conv

Dtype = Any


class SD3LatentFormat:
    scale_factor: float = 1.5305
    shift_factor: float = 0.0609

    @classmethod
    def process_in(cls, latent):
        return (latent - cls.shift_factor) * cls.scale_factor

    @classmethod
    def process_out(cls, latent):
        return (latent / cls.scale_factor) + cls.shift_factor

    # 16-ch latent → approximate RGB preview matrix (sd3_infer.py:156-163)
    PREVIEW_FACTORS = np.asarray([
        [-0.0645, 0.0177, 0.1052], [0.0028, 0.0312, 0.0650],
        [0.1848, 0.0762, 0.0360], [0.0944, 0.0360, 0.0889],
        [0.0897, 0.0506, -0.0364], [-0.0020, 0.1203, 0.0284],
        [0.0855, 0.0118, 0.0283], [-0.0539, 0.0658, 0.1047],
        [-0.0057, 0.0116, 0.0700], [-0.0412, 0.0281, -0.0039],
        [0.1106, 0.1171, 0.1220], [-0.0248, 0.0682, -0.0481],
        [0.0815, 0.0846, 0.1207], [-0.0120, -0.0055, -0.0867],
        [-0.0749, -0.0634, -0.0456], [-0.1418, -0.1457, -0.1259]],
        dtype=np.float32)

    @classmethod
    def decode_latent_to_preview(cls, x0):
        """(B, H, W, 16) NHWC latent -> uint8 (B, H, W, 3) preview."""
        img = jnp.asarray(x0) @ jnp.asarray(cls.PREVIEW_FACTORS)
        return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


class SD3VAEEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, H, W, 3) in [−1,1] -> (B, H/8, W/8, 2·z) mean|log_var."""
        dt = self.dtype
        h = nn.Conv(self.ch, (3, 3), dtype=dt, name="conv_in")(x.astype(dt))
        for i_level, mult in enumerate(self.ch_mult):
            out_ch = self.ch * mult
            for i_block in range(self.num_res_blocks):
                h = VAEResBlock(out_ch, dtype=dt,
                                name=f"down{i_level}_block{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = _downsample_conv(out_ch, dt, f"down{i_level}_downsample")(h)
        h = VAEResBlock(h.shape[-1], dtype=dt, name="mid_block1")(h)
        h = VAEAttentionBlock(dtype=dt, name="mid_attn")(h)
        h = VAEResBlock(h.shape[-1], dtype=dt, name="mid_block2")(h)
        h = GroupNorm(32, act="silu", name="norm_out")(h)
        return nn.Conv(2 * self.z_channels, (3, 3), dtype=dt,
                       name="conv_out")(h).astype(jnp.float32)


class SD3VAEDecoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    out_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        dt = self.dtype
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3), dtype=dt,
                    name="conv_in")(z.astype(dt))
        h = VAEResBlock(h.shape[-1], dtype=dt, name="mid_block1")(h)
        h = VAEAttentionBlock(dtype=dt, name="mid_attn")(h)
        h = VAEResBlock(h.shape[-1], dtype=dt, name="mid_block2")(h)
        for i_level in reversed(range(len(self.ch_mult))):
            out_ch = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = VAEResBlock(out_ch, dtype=dt,
                                name=f"up{i_level}_block{i_block}")(h)
            if i_level != 0:
                h = upsample_nearest_2x(h)
                h = nn.Conv(out_ch, (3, 3), dtype=dt,
                            name=f"up{i_level}_upsample")(h)
        h = GroupNorm(32, act="silu", name="norm_out")(h)
        return nn.Conv(self.out_channels, (3, 3), dtype=dt,
                       name="conv_out")(h).astype(jnp.float32)


class SDVAE(nn.Module):
    """Paired encoder/decoder with reparameterized encode."""

    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = SD3VAEEncoder(dtype=self.dtype)
        self.decoder = SD3VAEDecoder(dtype=self.dtype)

    def encode(self, image, rng):
        h = self.encoder(image)
        mean, log_var = jnp.split(h, 2, axis=-1)
        log_var = jnp.clip(log_var, -30.0, 20.0)
        std = jnp.exp(0.5 * log_var)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, latent):
        return self.decoder(latent)

    def __call__(self, image, rng):
        return self.decode(self.encode(image, rng))
