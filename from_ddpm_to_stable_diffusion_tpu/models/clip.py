"""From-scratch CLIP (ViT-L/14 class) — image + text towers (stage 05).

TPU-native re-design of /root/reference/05_clip/model_clip_vit.py:
- VisionTransformer (:58-102): conv patchify (no bias), class token,
  LN-pre / LN-post, projection from the class-token state.
- Text tower (:105-172): token + learned positional embeddings, causal
  transformer, final LN, EOS-argmax pooling, text projection.
- forward (:174-188): L2-normalized features, cosine logits scaled by
  ``exp(logit_scale)`` (init ln(1/0.07)).

Additions beyond the reference: contrastive (InfoNCE) and SigLIP sigmoid
pairwise losses as pure functions, so the towers are trainable end-to-end.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm, SelfAttention

Dtype = Any


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = LayerNorm(name="ln1")(x)
        h = SelfAttention(self.num_heads, qkv_bias=True, causal=self.causal,
                          dtype=self.dtype, name="attn")(h)
        x = x + h
        h = LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        h = nn.Dense(c, dtype=self.dtype, name="proj")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    input_resolution: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    output_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) -> pooled projected features (B, output_dim)."""
        b = x.shape[0]
        p = self.patch_size
        heads = max(1, self.width // 64)
        h = nn.Conv(self.width, (p, p), strides=(p, p), padding="VALID",
                    use_bias=False, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        h = h.reshape(b, -1, self.width)
        scale = self.width**-0.5
        cls = self.param("class_embedding",
                         nn.initializers.normal(scale), (self.width,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(h.dtype), h],
            axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(scale),
                         (h.shape[1], self.width))
        h = h + pos.astype(h.dtype)
        h = LayerNorm(name="ln_pre")(h)
        for i in range(self.layers):
            h = ResidualAttentionBlock(heads, dtype=self.dtype,
                                       name=f"block{i}")(h)
        h = LayerNorm(name="ln_post")(h[:, 0])
        proj = self.param("proj", nn.initializers.normal(scale),
                          (self.width, self.output_dim))
        return h @ proj.astype(h.dtype)


class CLIP(nn.Module):
    embed_dim: int = 768
    image_resolution: int = 224
    vision_layers: int = 24
    vision_width: int = 1024
    vision_patch_size: int = 14
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 768
    transformer_heads: int = 12
    transformer_layers: int = 12
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual = CLIPVisionTower(
            self.image_resolution, self.vision_patch_size, self.vision_width,
            self.vision_layers, self.embed_dim, self.dtype)
        self.token_embedding = nn.Embed(self.vocab_size,
                                        self.transformer_width,
                                        dtype=self.dtype)
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.transformer_width))
        self.text_blocks = [
            ResidualAttentionBlock(self.transformer_heads, causal=True,
                                   dtype=self.dtype, name=f"text_block{i}")
            for i in range(self.transformer_layers)]
        self.ln_final = LayerNorm()
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.transformer_width**-0.5),
            (self.transformer_width, self.embed_dim))
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1.0 / 0.07)), ())

    def encode_image(self, image):
        return self.visual(image)

    def encode_text(self, text):
        """text: (B, 77) int token ids; EOS = argmax id (highest token)."""
        x = self.token_embedding(text)
        x = x + self.positional_embedding.astype(x.dtype)
        for block in self.text_blocks:
            x = block(x)
        x = self.ln_final(x)
        eos = jnp.argmax(text, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos]
        return pooled @ self.text_projection.astype(pooled.dtype)

    def __call__(self, image, text):
        """Returns (logits_per_image, logits_per_text)."""
        img = self.encode_image(image)
        txt = self.encode_text(text)
        img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=1,
                                    keepdims=True)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=1,
                                    keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img.astype(jnp.float32) @ txt.astype(
            jnp.float32).T
        return logits_per_image, logits_per_image.T


def clip_contrastive_loss(logits_per_image):
    """Symmetric InfoNCE over an (N, N) cosine-logit matrix."""
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)
    li = -jnp.mean(jax.nn.log_softmax(logits_per_image, axis=1)[
        labels, labels])
    lt = -jnp.mean(jax.nn.log_softmax(logits_per_image.T, axis=1)[
        labels, labels])
    return 0.5 * (li + lt)


def siglip_loss(img_feats, txt_feats, temperature, bias):
    """SigLIP pairwise sigmoid loss (not implemented in the reference,
    05_clip/model_siglip.py — vision tower only)."""
    img = img_feats / jnp.linalg.norm(img_feats, axis=1, keepdims=True)
    txt = txt_feats / jnp.linalg.norm(txt_feats, axis=1, keepdims=True)
    logits = img @ txt.T * temperature + bias
    n = logits.shape[0]
    signs = 2.0 * jnp.eye(n) - 1.0  # +1 diag (pairs), −1 off-diag
    return -jnp.mean(jax.nn.log_sigmoid(signs * logits))
