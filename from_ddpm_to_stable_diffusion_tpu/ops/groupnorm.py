"""GroupNorm (+ optional SiLU fusion) over NHWC activations.

Replaces every ``nn.GroupNorm(32, C)`` in the reference's ResBlocks / VAE /
UNet tails (e.g. 01_.../stable_diffusion_pytorch/diffusion.py:20-50,
02_stable_diffusion-3/utils.py:539-569, 06_.../diffusion.py:85-115) with an
NHWC, fp32-statistics implementation. XLA already fuses the normalize +
affine + SiLU chain into one elementwise pass after the reduction; a Pallas
single-pass variant exists in :mod:`.groupnorm_pallas` for the hot VAE/UNet
shapes and is dispatched automatically on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    num_groups: int,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    act: Optional[str] = None,
) -> jax.Array:
    """GroupNorm over the last (channel) axis of an NHWC/N...C tensor.

    Statistics are computed per (batch, group) over all spatial positions and
    in-group channels, in float32; output keeps the input dtype.
    ``act='silu'`` fuses the SiLU that follows every GroupNorm in the
    reference ResBlocks.
    """
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by {num_groups}"
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(f"unknown act {act!r}")
    return out.astype(orig_dtype)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """Plain LayerNorm with fp32 statistics (CLIP's fp32-cast LN,
    05_clip/model_clip_vit.py:8-14)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def rms_norm(x, scale=None, eps: float = 1e-6):
    """RMSNorm (MMDiT qk-norm, 02_stable_diffusion-3/mmdit.py:183-226; T5
    LayerNorm, 02_.../utils.py:345-354): no mean subtraction, fp32 stats."""
    xf = x.astype(jnp.float32)
    norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if scale is not None:
        norm = norm * scale.astype(jnp.float32)
    return norm.astype(x.dtype)
