"""Sinusoidal time / position embeddings (pure jnp, jit-safe).

Parity targets (file:line into /root/reference):
- ``sd1_time_embedding``: 01_stable_diffusion-1/stable_diffusion_pytorch/util.py:6-9
  (160 freqs 10000^(−i/160), [cos, sin] → (·, 320)).
- ``timestep_embedding``: 06_tiny_stable_diffusion/diffusion.py:23-30 and
  02_stable_diffusion-3/mmdit.py:70-92 (half-dim exp-log freqs, [cos, sin]).
- ``patch_pos_embed_2d`` mirrors the fixed 2-D sincos grid option of MMDiT's
  PatchEmbed (02_stable_diffusion-3/mmdit.py:9-49).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sd1_time_embedding(timestep, dtype=jnp.float32):
    """SD1 UNet time feature: (B,) or scalar -> (B, 320) [cos | sin]."""
    t = jnp.atleast_1d(jnp.asarray(timestep, dtype=dtype))
    # Freq table built on host in float64 (static), cast once: the fp32-pow
    # relative error would otherwise be amplified by t≈1000 inside cos/sin.
    freqs = jnp.asarray(
        np.power(10000.0, -np.arange(0, 160, dtype=np.float64) / 160.0), dtype
    )
    x = t[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=-1)


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       dtype=jnp.float32):
    """DiT-style sinusoidal embedding: (B,) -> (B, dim) [cos | sin].

    freqs = exp(−ln(max_period)·i/half), i ∈ [0, half); odd dims zero-padded.
    """
    half = dim // 2
    freqs = jnp.asarray(
        np.exp(-np.log(max_period) * np.arange(0, half, dtype=np.float64) / half),
        jnp.float32,
    )
    args = jnp.asarray(t, jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


def pos_embed_2d_sincos(embed_dim: int, grid_h: int, grid_w: int,
                        scale: float = 1.0) -> np.ndarray:
    """Fixed 2-D sincos position table: (grid_h*grid_w, embed_dim), host numpy.

    Half the channels encode the y coordinate, half the x, each with the
    standard 1-D sincos recipe (quarter-dim omega = 1/10000^(i/(d/4))).
    """
    assert embed_dim % 4 == 0, "2-D sincos needs embed_dim % 4 == 0"

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000.0**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_y = np.arange(grid_h, dtype=np.float64) / scale
    grid_x = np.arange(grid_w, dtype=np.float64) / scale
    yy, xx = np.meshgrid(grid_y, grid_x, indexing="ij")
    emb_y = _1d(embed_dim // 2, yy)
    emb_x = _1d(embed_dim // 2, xx)
    return np.concatenate([emb_y, emb_x], axis=1).astype(np.float32)


def crop_pos_embed(pos_embed, grid_size: int, target_h: int, target_w: int):
    """Center-crop a (1, grid²·, D) learned pos-embed grid to (1, h·w, D).

    TPU-native form of MMDiT ``cropped_pos_embed``
    (02_stable_diffusion-3/mmdit.py:496-515): static shapes, pure gather.
    """
    d = pos_embed.shape[-1]
    grid = pos_embed.reshape(grid_size, grid_size, d)
    top = (grid_size - target_h) // 2
    left = (grid_size - target_w) // 2
    crop = grid[top : top + target_h, left : left + target_w]
    return crop.reshape(1, target_h * target_w, d)
