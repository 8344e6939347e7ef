"""Attention primitives.

One functional entry point, :func:`dot_product_attention`, dispatches between
the XLA path (always available, any backend) and the Pallas TPU flash kernel
(:mod:`.flash_attention`) when shapes are tile-friendly and we are on TPU.

This is the TPU-native replacement for every attention in the reference:
- hand-rolled softmax attention  01_.../stable_diffusion_pytorch/attention.py:7-70
- SDPA wrapper                   02_stable_diffusion-3/utils.py:11-17
- SigLIP manual attention        05_clip/model_siglip.py:78-139

Convention: q, k, v are (batch, num_heads, seq, head_dim); optional additive
``bias`` broadcastable to (batch, heads, q_len, kv_len); ``causal`` applies a
lower-triangular mask. Softmax accumulates in fp32 regardless of input dtype
(bf16-in / bf16-out with fp32 logits is the TPU policy).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, bias, causal: bool, scale: float):
    # fp32 inputs mean the caller wants true fp32 math — stop XLA's default
    # bf16 downcast on the MXU. bf16 inputs ride the native MXU path.
    precision = (jax.lax.Precision.HIGHEST
                 if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=precision) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        q_len, k_len = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((q_len, k_len), dtype=bool), k_len - q_len)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, precision=precision)


def _flash_eligible(q, k, v, bias) -> bool:
    if jax.default_backend() != "tpu":
        return False
    q_len, k_len = q.shape[-2], k.shape[-2]
    # Short sequences (text encoders, 77 tokens) are faster through plain XLA
    # fused attention; long spatial/joint sequences need the flash kernel.
    return q_len >= 512 and k_len >= 512


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    segment_ids=None,
    seg_max_kv_blocks: Optional[int] = None,
) -> jax.Array:
    """Scaled dot-product attention over (B, H, L, D) tensors.

    ``segment_ids``: optional (q_ids (B, Lq), kv_ids (B, Lk)) packed-
    sequence masking (same-segment pairs only; see flash_attention).
    ``seg_max_kv_blocks``: static per-q-block live-range bound for packed
    layouts — truncates the flash kernel's k grid (see flash_attention);
    a pure perf hint, ignored on the XLA path.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_flash is None:
        use_flash = _flash_eligible(q, k, v, bias)
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, segment_ids=segment_ids,
                               causal=causal, scale=scale,
                               seg_max_kv_blocks=seg_max_kv_blocks)
    if segment_ids is not None:
        same = (segment_ids[0][:, None, :, None]
                == segment_ids[1][:, None, None, :])
        seg_bias = jnp.where(same, 0.0, -1e30)
        bias = seg_bias if bias is None else bias + seg_bias
    return _xla_attention(q, k, v, bias, causal, scale)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, H·D) -> (B, H, L, D)."""
    b, l, hd = x.shape
    return x.reshape(b, l, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, L, D) -> (B, L, H·D)."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def attention_blhd(q, k, v, bias=None, causal: bool = False, **kw):
    """Attention over (B, L, H, D) tensors; output (B, L, H, D).

    Note: a transpose-free BLHD kernel entry was tried and measured — the
    Mosaic TPU lowering requires the last two block dims to be
    (8k, 128k)-divisible or full, so per-head (…, 1, D) blocks over a
    (B, L, H, D) array are unlowerable for D<128, and full-H blocks put H
    on the sublane axis (strided MXU feeds). The head transposes stay
    (~0.5 ms/step in the SD1 UNet); this wrapper just centralizes them.
    """
    t = lambda x: x.transpose(0, 2, 1, 3)
    out = dot_product_attention(t(q), t(k), t(v), bias=bias, causal=causal,
                                **kw)
    return t(out)


def multi_head_attention(
    q, k, v, num_heads: int, bias=None, causal: bool = False, **kw
) -> jax.Array:
    """Attention over (B, L, D_model) activations with head split/merge."""
    b, lq, dm = q.shape
    lk = k.shape[1]
    d = dm // num_heads
    out = attention_blhd(
        q.reshape(b, lq, num_heads, d),
        k.reshape(b, lk, num_heads, d),
        v.reshape(b, lk, num_heads, d),
        bias=bias, causal=causal, **kw)
    return out.reshape(b, lq, dm)


def joint_attention_blhd(ctx_qkv, x_qkv, interpret: bool = False,
                         stability: str = "online"):
    """MMDiT joint attention over [context ‖ x] WITHOUT concatenating the
    streams: split-KV lse-merged flash calls (see
    flash_attention.joint_flash_attention). Inputs are (q, k, v) triples in
    (B, L, H, D); returns (ctx_out, x_out) in the same layout.

    Why: at SD3-medium's op point (154+4096 tokens) single-call flash pads
    the joint length to 5120 on both axes — 31% wasted logit work at the
    per-logit-bound op point — plus three concat copies per block. The
    decomposition's dominant call (x×x, 4096²) is perfectly block-aligned
    and takes the kernels' no-mask fast path. Differentiable (custom VJP
    mirrors ring attention's global-lse backward).
    """
    t = lambda a: a.transpose(0, 2, 1, 3)
    qc, kc, vc = (t(a) for a in ctx_qkv)
    qx, kx, vx = (t(a) for a in x_qkv)
    d = qx.shape[-1]
    if _flash_eligible(qx, kx, vx, None) or interpret:
        from .flash_attention import joint_flash_attention

        oc, ox = joint_flash_attention(qc, kc, vc, qx, kx, vx, d ** -0.5,
                                       interpret=interpret,
                                       stability=stability)
    else:  # CPU / short-seq path: concatenate + XLA (numerics oracle)
        lc = qc.shape[2]
        q, k, v = (jnp.concatenate(ab, axis=2)
                   for ab in ((qc, qx), (kc, kx), (vc, vx)))
        out = _xla_attention(q, k, v, None, False, d ** -0.5)
        oc, ox = out[:, :, :lc], out[:, :, lc:]
    return t(oc), t(ox)
