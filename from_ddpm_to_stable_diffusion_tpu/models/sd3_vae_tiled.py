"""Streamed (spatially tiled) SD3 VAE decode — exact, bounded live set.

A whole-image 1024² decode holds a ladder of GiB-scale activations
(1024²×256ch bf16 = 512 MB/image, several live at once plus fp32
GroupNorm intermediates), which is what caps the serving batch at the
all-resident op point (docs/SERVING_CURVE.md).  This module re-executes
the SAME decoder parameters (reference decoder:
02_stable_diffusion-3/utils.py:619-687 → models/sd3_vae.py) as a stream
of row-strip programs whose live set is two full bf16 buffers + one
strip workspace:

- The head (conv_in, mid res/attn/res) runs whole at LATENT resolution —
  the attention there is global over all h·w tokens and cheap (16 MB
  buffers), so tiling it is neither possible (softmax couples every
  token) nor useful.
- Every GroupNorm in the upsampling ladder is computed EXACTLY in two
  passes: a whole-buffer fp32 statistics reduction (reads the buffer
  once, emits per-channel means/rstds — no fp32 copy is ever
  materialized), then a per-strip affine+SiLU fused into the following
  3×3 conv.
- Buffers carry a 1-pixel zero border (halo).  Strips slice (S+2) rows
  including the halo, so every conv is VALID and the same math as the
  padded whole-image conv; border positions are masked to zero AFTER
  the activation (zero-padding in the reference applies to the conv
  input, i.e. post-GN/SiLU).

Exactness vs ``SD3VAEDecoder.apply`` is pinned by
tests/test_sd3_vae_tiled.py across strip boundaries.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import upsample_nearest_2x
from .sd1 import VAEAttentionBlock, VAEResBlock

Dtype = Any
_GROUPS = 32
_EPS = 1e-5


def _interior(buf):
    return buf[:, 1:-1, 1:-1, :]


@functools.partial(jax.jit, static_argnames=("groups",))
def _gn_stats(buf, groups: int = _GROUPS):
    """Whole-buffer fp32 GroupNorm statistics over the interior.

    Returns per-channel (B, C) mean/rstd so the strip kernel applies a
    plain per-channel affine (the group→channel expansion happens here,
    once).  Matches ops/groupnorm.group_norm's fp32 mean/E[x²] math."""
    x = _interior(buf).astype(jnp.float32)
    b, h, w, c = x.shape
    cg = c // groups
    g = x.reshape(b, h * w, groups, cg)
    mean = jnp.mean(g, axis=(1, 3))
    var = jnp.mean(jnp.square(g), axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + _EPS)
    expand = lambda a: jnp.repeat(a, cg, axis=1)
    return expand(mean), expand(rstd)


def _conv_valid(y, kernel):
    return jax.lax.conv_general_dilated(
        y, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(
    jax.jit, donate_argnums=(1,),
    static_argnames=("height", "strip", "act", "has_skip"))
def _strip_conv(xbuf, outbuf, gi, mean, rstd, gn_scale, gn_bias,
                kernel, bias, skipbuf=None, skip_kernel=None,
                skip_bias=None, *, height: int, strip: int,
                act: bool = True, has_skip: bool = False):
    """One output strip: GN-affine → SiLU → 3×3 VALID conv (+ residual).

    ``xbuf``/``outbuf``/``skipbuf`` are (B, H+2, W+2, C*) zero-bordered
    buffers; ``gi`` is the strip's first interior row.  The strip window
    includes the 1-row/col halo; positions outside the image are masked
    to zero after the activation (exactly the whole-image conv's zero
    pad).  ``outbuf`` is donated — the stream updates it in place."""
    b, hp, wp, c = xbuf.shape
    w = wp - 2
    win = jax.lax.dynamic_slice(
        xbuf, (0, gi, 0, 0), (b, strip + 2, wp, c))
    y = win.astype(jnp.float32)
    y = (y - mean[:, None, None, :]) * rstd[:, None, None, :]
    y = y * gn_scale + gn_bias
    if act:
        y = jax.nn.silu(y)
    # mask halo positions outside the image (their buffer value is the
    # border zero, which the affine turned into a nonzero constant)
    rows = gi - 1 + jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    row_ok = jnp.logical_and(rows >= 0, rows < height)
    cols = jax.lax.broadcasted_iota(jnp.int32, y.shape, 2)
    col_ok = jnp.logical_and(cols >= 1, cols <= w)
    y = jnp.where(jnp.logical_and(row_ok, col_ok), y, 0.0)
    t = _conv_valid(y.astype(xbuf.dtype), kernel) + bias
    if has_skip:
        sk = jax.lax.dynamic_slice(
            skipbuf, (0, gi + 1, 1, 0), (b, strip, w, skipbuf.shape[-1]))
        if skip_kernel is not None:
            sk = _conv_valid(sk, skip_kernel) + skip_bias
        t = t + sk
    return jax.lax.dynamic_update_slice(
        outbuf, t.astype(outbuf.dtype), (0, gi + 1, 1, 0))


@functools.partial(jax.jit, donate_argnums=(1,),
                   static_argnames=("height", "strip"))
def _strip_plain_conv(xbuf, outbuf, gi, kernel, bias, *, height: int,
                      strip: int):
    """3×3 VALID conv strip with no pre-norm (the post-upsample conv —
    its zero border is already correct conv input)."""
    b, hp, wp, c = xbuf.shape
    win = jax.lax.dynamic_slice(
        xbuf, (0, gi, 0, 0), (b, strip + 2, wp, c))
    t = _conv_valid(win, kernel) + bias
    return jax.lax.dynamic_update_slice(
        outbuf, t.astype(outbuf.dtype), (0, gi + 1, 1, 0))


def _stream_gn_conv(xbuf, gn_p, conv_p, out_c, *, height, strip, act=True,
                    skipbuf=None, skip_p=None, dtype=jnp.bfloat16):
    b, hp, wp, _ = xbuf.shape
    outbuf = jnp.zeros((b, hp, wp, out_c), dtype)
    mean, rstd = _gn_stats(xbuf)
    gn_scale = jnp.asarray(gn_p["scale"], jnp.float32)
    gn_bias = jnp.asarray(gn_p["bias"], jnp.float32)
    kernel = jnp.asarray(conv_p["kernel"], dtype)
    bias = jnp.asarray(conv_p["bias"], dtype)
    sk_k = sk_b = None
    if skip_p is not None:
        sk_k = jnp.asarray(skip_p["kernel"], dtype)
        sk_b = jnp.asarray(skip_p["bias"], dtype)
    s = min(height, strip)
    for gi in range(0, height, s):
        outbuf = _strip_conv(
            xbuf, outbuf, jnp.int32(gi), mean, rstd, gn_scale, gn_bias,
            kernel, bias, skipbuf, sk_k, sk_b,
            height=height, strip=s, act=act, has_skip=skipbuf is not None)
    return outbuf


def _stream_plain_conv(xbuf, conv_p, out_c, *, height, strip, dtype):
    b, hp, wp, _ = xbuf.shape
    outbuf = jnp.zeros((b, hp, wp, out_c), dtype)
    kernel = jnp.asarray(conv_p["kernel"], dtype)
    bias = jnp.asarray(conv_p["bias"], dtype)
    s = min(height, strip)
    for gi in range(0, height, s):
        outbuf = _strip_plain_conv(xbuf, outbuf, jnp.int32(gi),
                                   kernel, bias, height=height, strip=s)
    return outbuf


def _stream_res_block(xbuf, p, out_c, *, height, strip, dtype):
    """VAEResBlock (models/sd1.py:194-211) streamed: GN+SiLU+conv ×2 with
    the 1×1 skip folded into the second conv's strips."""
    in_c = xbuf.shape[-1]
    h = _stream_gn_conv(xbuf, p["norm1"], p["conv1"], out_c,
                        height=height, strip=strip, dtype=dtype)
    skip_p = p.get("skip") if in_c != out_c else None
    return _stream_gn_conv(h, p["norm2"], p["conv2"], out_c,
                           height=height, strip=strip, skipbuf=xbuf,
                           skip_p=skip_p, dtype=dtype)


@jax.jit
def _upsample_buf(xbuf):
    """Nearest-2× of the interior into a fresh zero-bordered buffer."""
    up = upsample_nearest_2x(_interior(xbuf))
    return jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)))


@functools.partial(jax.jit, static_argnames=("ch_top", "dt"))
def _head(p, z, ch_top: int, dt):
    """conv_in + mid res/attn/res at latent resolution, whole-image."""
    h = nn.Conv(ch_top, (3, 3), dtype=dt).apply({"params": p["conv_in"]},
                                                z.astype(dt))
    h = VAEResBlock(ch_top, dtype=dt).apply({"params": p["mid_block1"]}, h)
    h = VAEAttentionBlock(dtype=dt).apply({"params": p["mid_attn"]}, h)
    h = VAEResBlock(ch_top, dtype=dt).apply({"params": p["mid_block2"]}, h)
    return jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))


def tiled_decode(params, z, *, ch: int = 128,
                 ch_mult: Sequence[int] = (1, 2, 4, 4),
                 num_res_blocks: int = 2, out_channels: int = 3,
                 dtype=jnp.bfloat16, strip: int = 128,
                 image_batch: Optional[int] = None):
    """Exact SD3VAEDecoder forward with a bounded live set.

    ``params``: the decoder's param tree (same tree ``SD3VAEDecoder.apply``
    takes, with or without the "params" wrapper).  ``strip``: output rows
    per streamed conv program.  ``image_batch``: optionally decode in
    sub-batches of this many images (caps the full-buffer term too).
    Returns fp32 NHWC in [-1, 1], identical to the whole-image decode up
    to fp rounding."""
    if "params" in params and isinstance(params["params"], dict):
        params = params["params"]
    if image_batch and z.shape[0] > image_batch:
        outs = [tiled_decode(params, z[i:i + image_batch], ch=ch,
                             ch_mult=ch_mult, num_res_blocks=num_res_blocks,
                             out_channels=out_channels, dtype=dtype,
                             strip=strip)
                for i in range(0, z.shape[0], image_batch)]
        return jnp.concatenate(outs, axis=0)

    buf = _head(params, z, ch * ch_mult[-1], dtype)
    height = z.shape[1]
    for i_level in reversed(range(len(ch_mult))):
        out_ch = ch * ch_mult[i_level]
        for i_block in range(num_res_blocks + 1):
            buf = _stream_res_block(
                buf, params[f"up{i_level}_block{i_block}"], out_ch,
                height=height, strip=strip, dtype=dtype)
        if i_level != 0:
            buf = _upsample_buf(buf)
            height *= 2
            buf = _stream_plain_conv(
                buf, params[f"up{i_level}_upsample"], out_ch,
                height=height, strip=strip, dtype=dtype)
    out = _stream_gn_conv(buf, params["norm_out"], params["conv_out"],
                          out_channels, height=height, strip=strip,
                          dtype=dtype)
    return _interior(out).astype(jnp.float32)
