"""InceptionV3 pool3 feature extractor — the canonical FID featurizer.

BASELINE.md names FID parity as the quality contract; ``utils/metrics.py``
is featurizer-agnostic and this module supplies the standard featurizer
(the pytorch-fid "FID Inception" variant of torchvision InceptionV3, 299²
input, 2048-d pool3 output) so canonical FID runs the moment the
``pt_inception-2015-12-05`` weights exist.  NHWC, inference-only.

FID-variant quirks reproduced from pytorch-fid's patched model:
- branch_pool average pools exclude padding (count_include_pad=False);
- the LAST InceptionE (Mixed_7c) uses MAX pooling in its pool branch;
- inputs in [0, 1] are scaled to [−1, 1]; resize is bilinear to 299².

BatchNorms run in inference mode and are FOLDED into per-channel
scale/bias at import time (io/weights_inception.py), so each BasicConv2d
here is conv → affine → relu.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicConv2d(nn.Module):
    """conv (no bias) + folded-BatchNorm affine + relu."""

    features: int
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=tuple(self.strides), padding=self.padding,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return jax.nn.relu(x * scale.astype(x.dtype)
                           + bias.astype(x.dtype))


def _avg_pool_3x3(x):
    # FID variant: padding excluded from the divisor
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=False)


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c1 = partial(BasicConv2d, kernel=(1, 1), dtype=self.dtype)
        b1 = c1(64, name="branch1x1")(x)
        b5 = c1(48, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         dtype=self.dtype, name="branch5x5_2")(b5)
        bd = c1(64, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="branch3x3dbl_3")(bd)
        bp = c1(self.pool_features, name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b5, bd, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        h_pad = ((0, 0), (3, 3))   # 1×7
        v_pad = ((3, 3), (0, 0))   # 7×1
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=h_pad, dtype=self.dtype,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=v_pad, dtype=self.dtype,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype,
                         name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=v_pad, dtype=self.dtype,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=h_pad, dtype=self.dtype,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=v_pad, dtype=self.dtype,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=h_pad, dtype=self.dtype,
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"   # Mixed_7c (the last) uses "max" — FID quirk
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h_pad = ((0, 0), (1, 1))
        v_pad = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=h_pad, dtype=self.dtype,
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=v_pad, dtype=self.dtype,
                        name="branch3x3_2b")(b3)], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=h_pad, dtype=self.dtype,
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=v_pad, dtype=self.dtype,
                        name="branch3x3dbl_3b")(bd)], axis=-1)
        if self.pool == "max":
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
        else:
            pooled = _avg_pool_3x3(x)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """(B, 299, 299, 3) in [0, 1] → (B, 2048) pool3 features."""

    normalize_input: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype,
                        name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), dtype=self.dtype,
                        name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype,
                        name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(pool="max", dtype=self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))   # adaptive avg pool to 1×1


def resize_for_fid(images: jax.Array) -> jax.Array:
    """Bilinear resize to 299² (pytorch-fid's F.interpolate contract,
    align_corners=False semantics). images: (B, H, W, 3)."""
    b = images.shape[0]
    return jax.image.resize(images.astype(jnp.float32),
                            (b, 299, 299, 3), method="bilinear")
