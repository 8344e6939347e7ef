"""Trainable VAE family: VanillaVAE and VQ-VAE (stage 03 capability).

TPU-native re-design of /root/reference/03_variational_autoencoder/models.py:
- VanillaVAE (models.py:34-132): stride-2 conv ladder [32,64,128,256,512]
  with BatchNorm+LeakyReLU, fc mu/log_var heads, reparameterized latent,
  mirrored transpose-conv decoder with Tanh output; loss = MSE + M_N·KLD.
- VQVAE (models.py:135-378): conv ladder [64,128,256] k4s2 + 6 residual
  layers, L2-nearest codebook lookup with straight-through estimator
  (``z + stop_gradient(qz − z)``, the reference's only nonstandard autodiff
  construct, models.py:183), commitment β=0.25; mirrored decoder.

Differences by design: NHWC layout, fp32 norm statistics, explicit PRNG keys
for the reparameterization noise, and the codebook distance computed as one
(BHW, K) matmul on the MXU. ``encode``/``decode`` are public methods (usable
via ``model.apply(vars, z, method=Model.decode)``) so latent-space trainers
and samplers can call either half.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class _ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 2
    transpose: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.ConvTranspose if self.transpose else nn.Conv
        x = conv(self.features, (self.kernel, self.kernel),
                 strides=(self.stride, self.stride), padding="SAME",
                 dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="bn")(x)
        return nn.leaky_relu(x, 0.01)


class VanillaVAE(nn.Module):
    in_channels: int = 3
    image_size: int = 64
    latent_dim: int = 128
    hidden_dims: Sequence[int] = (32, 64, 128, 256, 512)
    dtype: Dtype = jnp.float32

    @property
    def scale(self) -> int:
        assert self.image_size % 32 == 0
        return self.image_size // 32

    def setup(self):
        dims = list(self.hidden_dims)
        self.enc_blocks = [
            _ConvBNAct(hd, dtype=self.dtype, name=f"enc{i}")
            for i, hd in enumerate(dims)]
        self.fc_mu = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc_var = nn.Dense(self.latent_dim, dtype=self.dtype)
        rdims = dims[::-1]
        self.decoder_input = nn.Dense(rdims[0] * self.scale**2,
                                      dtype=self.dtype)
        self.dec_blocks = [
            _ConvBNAct(rdims[i + 1], transpose=True, dtype=self.dtype,
                       name=f"dec{i}")
            for i in range(len(rdims) - 1)]
        self.final_up = _ConvBNAct(rdims[-1], transpose=True,
                                   dtype=self.dtype)
        self.final_conv = nn.Conv(self.in_channels, (3, 3), dtype=self.dtype)

    def __call__(self, x, rng=None, train: bool = False):
        """Returns (recon, mu, log_var). x: (B, H, W, C) in [-1, 1]."""
        z, mu, log_var = self.encode(x, rng, train)
        recon = self.decode(z, train)
        return recon, mu, log_var

    def encode(self, x, rng=None, train: bool = False):
        """Returns (z, mu, log_var) with reparameterized z."""
        h = x.astype(self.dtype)
        for block in self.enc_blocks:
            h = block(h, train)
        h = h.reshape(h.shape[0], -1)
        mu = self.fc_mu(h).astype(jnp.float32)
        log_var = self.fc_var(h).astype(jnp.float32)
        if rng is None:
            rng = self.make_rng("latent")
        std = jnp.exp(0.5 * log_var)
        eps = jax.random.normal(rng, std.shape, jnp.float32)
        z = (eps * std + mu).astype(self.dtype)
        return z, mu, log_var

    def decode(self, z, train: bool = False):
        rdims = list(self.hidden_dims)[::-1]
        s = self.scale
        h = self.decoder_input(z.astype(self.dtype))
        h = h.reshape(-1, s, s, rdims[0])
        for block in self.dec_blocks:
            h = block(h, train)
        h = self.final_up(h, train)
        h = self.final_conv(h)
        return jnp.tanh(h.astype(jnp.float32))

    def sample(self, rng, num_samples: int, train: bool = False):
        """Decode ``num_samples`` draws from the N(0, I) latent prior
        (reference BaseVAE.sample / VanillaVAE.sample,
        03_variational_autoencoder/models.py:19-20,128-133). ``rng``
        replaces the torch ``current_device`` argument — JAX randomness
        is explicit and placement is the runtime's job."""
        z = jax.random.normal(rng, (num_samples, self.latent_dim),
                              jnp.float32)
        return self.decode(z.astype(self.dtype), train)

    def generate(self, x, rng=None, train: bool = False):
        """Reconstruct ``x``: forward()[0] (reference BaseVAE.generate,
        03_variational_autoencoder/models.py:22-23,135-136)."""
        return self(x, rng, train)[0]

    @staticmethod
    def loss(recon, x, mu, log_var, kld_weight: float):
        """MSE + M_N-weighted KLD (reference models.py:116-126)."""
        recon_loss = jnp.mean((recon - x) ** 2)
        kld = jnp.mean(
            -0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=1))
        return {"loss": recon_loss + kld_weight * kld,
                "recon_loss": recon_loss, "kld": -kld}


class VectorQuantizer(nn.Module):
    """L2-nearest codebook lookup with straight-through gradients."""

    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, latents):
        """latents: (B, H, W, D) -> (quantized, vq_loss, indices)."""
        codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.num_embeddings,
                maxval=1.0 / self.num_embeddings),
            (self.num_embeddings, self.embedding_dim))
        flat = latents.reshape(-1, self.embedding_dim).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        # ‖z − e‖² expanded: one (BHW, K) matmul on the MXU
        dist = (jnp.sum(flat**2, axis=1, keepdims=True)
                + jnp.sum(cb**2, axis=1)[None, :]
                - 2.0 * flat @ cb.T)
        idx = jnp.argmin(dist, axis=1)
        quantized = jnp.take(cb, idx, axis=0).reshape(latents.shape)
        latents32 = latents.astype(jnp.float32)
        commitment = jnp.mean((jax.lax.stop_gradient(quantized) - latents32) ** 2)
        embedding = jnp.mean((quantized - jax.lax.stop_gradient(latents32)) ** 2)
        vq_loss = self.beta * commitment + embedding
        quantized = latents32 + jax.lax.stop_gradient(quantized - latents32)
        return (quantized.astype(latents.dtype), vq_loss,
                idx.reshape(latents.shape[:-1]))


class _ResidualLayer(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return h + x


class _VQEncoder(nn.Module):
    hidden_dims: Sequence[int]
    embedding_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for i, hd in enumerate(self.hidden_dims):
            h = nn.Conv(hd, (4, 4), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"down{i}")(h)
            h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(self.hidden_dims[-1], (3, 3), dtype=self.dtype,
                    name="conv")(h)
        h = nn.leaky_relu(h, 0.01)
        for i in range(6):
            h = _ResidualLayer(self.hidden_dims[-1], dtype=self.dtype,
                               name=f"res{i}")(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(self.embedding_dim, (1, 1), dtype=self.dtype,
                    name="out")(h)
        return nn.leaky_relu(h, 0.01)


class _VQDecoder(nn.Module):
    hidden_dims: Sequence[int]  # in original (ascending) order
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        rdims = list(self.hidden_dims)[::-1]
        h = nn.Conv(rdims[0], (3, 3), dtype=self.dtype, name="in")(
            z.astype(self.dtype))
        h = nn.leaky_relu(h, 0.01)
        for i in range(6):
            h = _ResidualLayer(rdims[0], dtype=self.dtype, name=f"res{i}")(h)
        h = nn.leaky_relu(h, 0.01)
        for i in range(len(rdims) - 1):
            h = nn.ConvTranspose(rdims[i + 1], (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name=f"up{i}")(h)
            h = nn.leaky_relu(h, 0.01)
        h = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype, name="out")(h)
        return jnp.tanh(h.astype(jnp.float32))


class VQVAE(nn.Module):
    in_channels: int = 3
    embedding_dim: int = 4
    num_embeddings: int = 128
    hidden_dims: Sequence[int] = (64, 128, 256)
    beta: float = 0.25
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = _VQEncoder(self.hidden_dims, self.embedding_dim,
                                  self.dtype)
        self.vq = VectorQuantizer(self.num_embeddings, self.embedding_dim,
                                  self.beta)
        self.decoder = _VQDecoder(self.hidden_dims, self.in_channels,
                                  self.dtype)

    def __call__(self, x):
        """Returns (recon, vq_loss, code_indices). x: (B, H, W, C) in [-1,1]."""
        z = self.encoder(x)
        quantized, vq_loss, idx = self.vq(z)
        recon = self.decoder(quantized)
        return recon, vq_loss, idx

    def sample(self, rng, num_samples: int):
        """No prior over code indices — the reference raises here too
        (03_variational_autoencoder/models.py:377-378)."""
        raise NotImplementedError("VQVAE sampler is not implemented")

    def generate(self, x):
        """Reconstruct ``x``: forward()[0] (reference BaseVAE.generate,
        03_variational_autoencoder/models.py:22-23)."""
        return self(x)[0]

    def encode(self, x):
        """Continuous (pre-quantization) latents (B, H/8, W/8, D)."""
        return self.encoder(x)

    def quantize(self, z):
        return self.vq(z)

    def decode(self, z):
        return self.decoder(z)

    @staticmethod
    def loss(recon, x, vq_loss):
        recon_loss = jnp.mean((recon - x) ** 2)
        return {"loss": recon_loss + vq_loss, "recon_loss": recon_loss,
                "vq_loss": vq_loss}
