"""Image tensor utilities (NHWC-first).

Parity targets: ``rescale`` / ``move_channel``
(01_stable_diffusion-1/stable_diffusion_pytorch/util.py:27-44) and the
nearest-×2 upsample used by every decoder/UNet Upsample block
(01_.../diffusion.py Upsample, 02_.../utils.py VAE Upsample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rescale(x, old_range, new_range, clamp: bool = False):
    """Affine range remap, optionally clamped — e.g. uint8 [0,255] ↔ [−1,1]."""
    old_min, old_max = old_range
    new_min, new_max = new_range
    x = (x - old_min) * ((new_max - new_min) / (old_max - old_min)) + new_min
    if clamp:
        x = jnp.clip(x, new_min, new_max)
    return x


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour ×2 upsample of NHWC via broadcast-reshape.

    Pure reshape/broadcast (no gather): XLA lowers this to a cheap
    relayout + copy on TPU, unlike ``jax.image.resize`` which builds a
    general gather.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def to_uint8(x: jax.Array) -> jax.Array:
    """[−1, 1] float image -> uint8 [0, 255] with rounding and clamping."""
    x = rescale(x, (-1.0, 1.0), (0.0, 255.0), clamp=True)
    return jnp.round(x).astype(jnp.uint8)


def image_grid(images, nrow: int):
    """Tile (N, H, W, C) into a single (rows·H, nrow·W, C) grid (host numpy)."""
    import numpy as np

    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * h, ncol * w, c), dtype=images.dtype)
    for idx in range(n):
        r, col = divmod(idx, ncol)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[idx]
    return grid


# OpenAI-CLIP inference preprocessing constants (the pip `clip` package's
# `preprocess` transform the reference's stage-05 check relies on,
# 05_clip/01_check.py:10).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(pil_image, resolution: int = 224):
    """PIL image -> (1, R, R, 3) float32, CLIP-normalized.

    Bicubic resize of the short side to ``resolution``, center crop, then
    per-channel normalization — matching pip clip's Compose(Resize,
    CenterCrop, ToTensor, Normalize) inference transform.
    """
    import numpy as np
    from PIL import Image

    img = pil_image.convert("RGB")
    w, h = img.size
    scale = resolution / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)),
                     Image.Resampling.BICUBIC)
    w, h = img.size
    left, top = (w - resolution) // 2, (h - resolution) // 2
    img = img.crop((left, top, left + resolution, top + resolution))
    x = np.asarray(img, dtype=np.float32) / 255.0
    x = (x - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    return x[None].astype(np.float32)
