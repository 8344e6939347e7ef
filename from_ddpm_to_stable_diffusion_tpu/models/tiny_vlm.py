"""TinyVLM — TPU-native trainable vision-language model (stage 07⁺).

The reference's stage 07 is a 21-line gated library call (MiniCPM-V chat,
/root/reference/07_multimodal/01_check.py) — capability: image + prompt →
text.  Like the stage-08⁺ video model, this is the from-scratch trainable
counterpart: a SigLIP vision tower (models/siglip.py) feeds projected patch
tokens as a prefix into a small causal transformer decoder; trained
end-to-end with next-token cross-entropy on synthetic captioned shapes
(io/shapes_dataset.py::CaptionedShapesDataset), it answers "describe the
image" by greedy decoding — every caption word (size/color/shape) is
visually grounded, so correctness requires actually reading the image.

TPU-first: one fused causal flash attention over [image-prefix | text]
(layers.SelfAttention), fixed shapes throughout (greedy decode re-runs the
full (N+L)-token forward per step — L≤8 here, so one compiled program
serves every step), bf16 compute with fp32 logits.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, SelfAttention
from .siglip import SiglipVisionConfig, SiglipVisionModel

Dtype = Any

TINY_VISION = SiglipVisionConfig(hidden_size=128, intermediate_size=256,
                                 num_hidden_layers=4, num_attention_heads=4,
                                 image_size=64, patch_size=8)


class DecoderBlock(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = LayerNorm(name="ln1")(x)
        h = SelfAttention(self.num_heads, qkv_bias=True, causal=True,
                          dtype=self.dtype, name="attn")(h)
        x = x + h
        h = LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return x + h


class TinyVLM(nn.Module):
    vocab_size: int
    dim: int = 128
    depth: int = 4
    num_heads: int = 4
    max_text_len: int = 8
    vision_cfg: SiglipVisionConfig = TINY_VISION
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, tokens):
        """images (B, S, S, 3) in [−1, 1]; tokens (B, L) int32.

        Returns text-position logits (B, L, vocab) — position t predicts
        token t+1 (both attend to the full image prefix).
        """
        v = SiglipVisionModel(self.vision_cfg, dtype=self.dtype,
                              name="vision")(images)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v)
        t = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                     name="tok")(tokens)
        pos = self.param("text_pos", nn.initializers.normal(0.02),
                         (self.max_text_len, self.dim))
        t = t + pos[: t.shape[1]].astype(t.dtype)
        h = jnp.concatenate([v, t], axis=1)
        for i in range(self.depth):
            h = DecoderBlock(self.num_heads, dtype=self.dtype,
                             name=f"block{i}")(h)
        h = LayerNorm(name="ln_f")(h[:, v.shape[1]:])
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32,
                          name="head")(h.astype(jnp.float32))
        return logits


def vlm_loss(logits, tokens, pad_id: int = 0, answer_start: int = 0):
    """Next-token cross entropy over non-pad targets.

    ``answer_start``: token index where supervised text begins (the static
    question/answer boundary for VQA) — targets before it are masked, so
    the model is never trained to predict the user's question.
    """
    targets = tokens[:, 1:]
    logits = logits[:, :-1]
    mask = (targets != pad_id).astype(jnp.float32)
    if answer_start > 1:
        pos = jnp.arange(targets.shape[1])
        mask = mask * (pos >= answer_start - 1).astype(jnp.float32)[None]
    ll = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ll, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def greedy_decode(model: TinyVLM, params, images, bos_id: int = 1,
                  max_len: int = 8, prompt_ids=None):
    """Greedy generation: (B, max_len) int32 token ids.

    ``prompt_ids`` (B, P) or (P,): fixed prefix (BOS + question for VQA);
    decoding fills slots P..max_len-1.  Fixed-shape: every step runs the
    same (N+L)-token forward (one compiled program), writing the argmax of
    position t into slot t+1.
    """
    b = images.shape[0]
    tokens0 = jnp.full((b, max_len), 0, jnp.int32).at[:, 0].set(bos_id)
    start = 0
    if prompt_ids is not None:
        prompt_ids = jnp.asarray(prompt_ids, jnp.int32)
        if prompt_ids.ndim == 1:
            prompt_ids = jnp.broadcast_to(prompt_ids,
                                          (b,) + prompt_ids.shape)
        start = prompt_ids.shape[1] - 1
        tokens0 = tokens0.at[:, : prompt_ids.shape[1]].set(prompt_ids)
    # module-level jit keyed on (model, start): eval loops reuse ONE
    # executable per shape instead of re-jitting per call
    return _decode_run(model, start, params, images, tokens0)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _decode_run(model, start, params, images, tokens):
    max_len = tokens.shape[1]

    def step(tokens, t):
        logits = model.apply({"params": params}, images, tokens)
        nxt = jnp.argmax(logits[:, t], axis=-1).astype(jnp.int32)
        return tokens.at[:, t + 1].set(nxt), None

    tokens, _ = jax.lax.scan(step, tokens, jnp.arange(start, max_len - 1))
    return tokens
