"""Int8 (W8A8) quantized matmul path for transformer serving.

TPU-native rationale: the v5e MXU runs int8·int8→int32 at 2× its bf16
FLOP rate (measured through this relay: 1.4–1.5× end-to-end on MMDiT-shaped
matmuls — tools/probe_int8.py), and MMDiT denoise is ~90% of the *bf16*
matmul roofline (docs/SD3_STEP_PROFILE). Quantizing the joint-block
projections (qkv / proj / mlp_fc1 / mlp_fc2 — the FLOPs mass) buys the
step time bf16 cannot reach, and halves those weights' HBM footprint.

Scheme (standard post-training W8A8, no calibration data needed):
  weights     — per-OUTPUT-channel symmetric int8: q = round(w/s), one
                fp32 scale per output column (absorbs per-channel spread).
  activations — per-TOKEN dynamic symmetric int8: each (..., K) row is
                scaled by its own abs-max/127 at run time. Dynamic scales
                cost one VPU pass but remove any calibration distribution
                assumption — right for diffusion inference where the
                latent statistics drift across sigma steps.
  accumulate  — int32 on the MXU, dequantized as acc · (xs ⊗ ws) in fp32,
                cast back to the module dtype.

Convs are deliberately NOT quantized: measured 0.8–1.1× at SD1 op points
(tools/probe_int8_conv.py) — they are not MXU-bound at serving shapes.
Attention itself stays bf16 flash (ops/flash_attention.py); quality-
sensitive small layers (adaLN, embedders, final head) stay bf16 too.

No reference counterpart (torch repo serves fp16/fp32 only); this is a
beyond-parity serving feature.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Pattern

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.sharding import _path_str

# the DismantledBlock FLOPs mass (models/mmdit.py) + T5 FF/attention
# projections (models/text_encoders.py)
# "/proj" and "/out", not bare substrings: SD1ResBlock's tiny time_proj
# (M=B rows) must stay bf16, and a bare "out" also matches "rOUTer" — the
# MoE router kernel, whose fp32 top-1 decisions must not flip with
# quantization noise. (proj_out is a conv — 4-D kernels never quantize.)
DEFAULT_TARGETS = re.compile(
    r"(qkv|/proj|/out|geglu_in|geglu_out|mlp_fc1|mlp_fc2|wi_0|wi_1|wo"
    r"|/q|/k|/v|/o)/kernel$")


def quantize_per_channel(w, axis: int = 0):
    """Symmetric int8 per-output-channel quantization of a 2-D kernel.

    ``axis`` is the CONTRACTION axis (reduced in the matmul); the scale is
    per element of the other (output) axis, so dequantization is a rank-1
    row/column rescale that fuses into the dot's epilogue.
    Returns (q int8, scale fp32 (out_features,)).
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(w / jnp.expand_dims(scale, axis)).astype(jnp.int8)
    return q, scale


def int8_dot(x, q, scale):
    """x (..., K) float → int8 MXU matmul against q (K, N) int8.

    Per-token dynamic activation scales: |x_row/xs| ≤ 127 by construction,
    so round() never overflows int8's ±127 symmetric range.
    """
    xf = x.astype(jnp.float32)
    xmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(xmax, 1e-8) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * scale).astype(x.dtype)


class QuantDense(nn.Module):
    """Drop-in nn.Dense for W8A8 serving: int8 kernel + per-channel scale.

    Parameters come from ``quantize_tree`` applied to a trained/imported
    bf16/fp32 tree (init gives placeholder zeros — shape discovery only).
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        q = self.param("q", nn.initializers.zeros_init(),
                       (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        y = int8_dot(x.astype(self.dtype), q, scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def dense_cls(int8_mm: bool):
    """nn.Dense, or QuantDense for the W8A8 serving path."""
    return QuantDense if int8_mm else nn.Dense


def quantize_tree(params, targets: Optional[Pattern] = None):
    """Post-training quantization transform over a param pytree.

    Every 2-D ``kernel`` whose path matches ``targets`` is replaced by
    {q, scale}; its sibling bias (if any) is kept. Everything else passes
    through untouched. The result applies through the SAME module tree
    built with int8 denses (e.g. ``MMDiT(int8_mm=True)``) — layer names
    are preserved so param paths line up.
    """
    targets = targets or DEFAULT_TARGETS
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # group leaves by parent dict path
    out = {}

    def set_path(tree, parts, value):
        for p in parts[:-1]:
            tree = tree.setdefault(p, {})
        tree[parts[-1]] = value

    for keypath, leaf in flat:
        path = _path_str(keypath)
        parts = path.split("/")
        if (parts[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2
                and targets.search(path)):
            q, scale = quantize_per_channel(leaf, axis=0)
            set_path(out, parts[:-1] + ["q"], q)
            set_path(out, parts[:-1] + ["scale"], scale)
        else:
            set_path(out, parts, leaf)
    return out
