"""VAE family tests: shapes, straight-through gradients, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.models.vae import (VanillaVAE,
                                                          VectorQuantizer,
                                                          VQVAE)
from from_ddpm_to_stable_diffusion_tpu.io import DataLoader, SyntheticImageDataset
from from_ddpm_to_stable_diffusion_tpu.pipelines.vae_trainer import VAETrainer
from from_ddpm_to_stable_diffusion_tpu.utils.config import VAETrainConfig

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def test_vanilla_vae_shapes():
    model = VanillaVAE(image_size=32, latent_dim=16,
                       hidden_dims=(8, 16, 32, 32, 32))
    x = jnp.zeros((2, 32, 32, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1)}
    variables = model.init(rngs, x)
    recon, mu, log_var = model.apply(variables, x,
                                     rngs={"latent": jax.random.key(2)})
    assert recon.shape == x.shape
    assert mu.shape == (2, 16) and log_var.shape == (2, 16)
    assert float(jnp.abs(recon).max()) <= 1.0  # tanh output

    metrics = VanillaVAE.loss(recon, x, mu, log_var, kld_weight=0.005)
    assert np.isfinite(float(metrics["loss"]))


def test_vanilla_vae_decode_is_generator():
    model = VanillaVAE(image_size=32, latent_dim=16,
                       hidden_dims=(8, 16, 32, 32, 32))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x)
    z = jax.random.normal(jax.random.key(3), (4, 16))
    samples = model.apply(variables, z, method=VanillaVAE.decode)
    assert samples.shape == (4, 32, 32, 3)


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(num_embeddings=8, embedding_dim=4)
    z = jax.random.normal(jax.random.key(0), (2, 4, 4, 4))
    params = vq.init(jax.random.key(1), z)

    def loss(z):
        q, vq_loss, _ = vq.apply(params, z)
        return jnp.sum(q * 2.0)

    g = jax.grad(loss)(z)
    # straight-through: dL/dz == dL/dq == 2 everywhere
    np.testing.assert_allclose(np.asarray(g), 2.0, atol=1e-6)


def test_vector_quantizer_picks_nearest_code():
    vq = VectorQuantizer(num_embeddings=4, embedding_dim=2)
    params = {"params": {"codebook": jnp.asarray(
        [[0.0, 0.0], [1.0, 1.0], [-1.0, -1.0], [5.0, 5.0]])}}
    z = jnp.asarray([[[[0.9, 1.1]]], [[[0.1, -0.05]]]])  # (2,1,1,2)
    q, _, idx = vq.apply(params, z)
    np.testing.assert_array_equal(np.asarray(idx).ravel(), [1, 0])
    np.testing.assert_allclose(np.asarray(q)[0, 0, 0], [1.0, 1.0])


def test_vqvae_shapes_and_loss():
    model = VQVAE(embedding_dim=4, num_embeddings=16, hidden_dims=(8, 16, 32))
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    recon, vq_loss, idx = model.apply(params, x)
    assert recon.shape == x.shape
    assert idx.shape == (2, 4, 4)  # 32 / 2³
    metrics = VQVAE.loss(recon, x, vq_loss)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("model_name", ["vqvae", "vanilla"])
def test_vae_training_smoke(model_name, devices8):
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh

    cfg = VAETrainConfig(
        epoch=2, batch_size=8, img_size=32, model=model_name,
        embedding_dim=4, num_embeddings=16, latent_dim=16, dtype="fp32",
        lr=3e-4)
    trainer = VAETrainer(cfg, mesh=build_mesh({"data": 8}, devices8))
    if model_name == "vanilla":
        trainer.model = VanillaVAE(image_size=32, latent_dim=16,
                                   hidden_dims=(8, 16, 32, 32, 32))
    else:
        trainer.model = VQVAE(embedding_dim=4, num_embeddings=16,
                              hidden_dims=(8, 16, 32))
    ds = SyntheticImageDataset(n=32, img_size=32)
    loader = DataLoader(ds, batch_size=8)
    state = trainer.create_state()
    rng = jax.random.key(0)
    losses = []
    for _ in range(2):
        for images, _ in loader:
            state, metrics = trainer.train_step(state, images, rng)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
    recon = trainer.reconstruct(state, np.zeros((2, 32, 32, 3), np.float32))
    assert recon.shape == (2, 32, 32, 3)


def test_vanilla_vae_sample_and_generate():
    """Prior-sample + reconstruct convenience API (reference
    03_variational_autoencoder/models.py:19-23,128-136)."""
    model = VanillaVAE(image_size=32, latent_dim=16,
                       hidden_dims=(8, 16, 32, 32, 32))
    x = jnp.zeros((2, 32, 32, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1)}
    variables = model.init(rngs, x)

    imgs = model.apply(variables, jax.random.key(3), 4,
                       method=VanillaVAE.sample)
    assert imgs.shape == (4, 32, 32, 3)
    assert float(jnp.abs(imgs).max()) <= 1.0

    # sample() decodes exactly the prior draw it makes
    z = jax.random.normal(jax.random.key(3), (4, 16), jnp.float32)
    direct = model.apply(variables, z, method=VanillaVAE.decode)
    np.testing.assert_allclose(np.asarray(imgs), np.asarray(direct),
                               atol=1e-6)

    recon = model.apply(variables, x, jax.random.key(2),
                        method=VanillaVAE.generate)
    assert recon.shape == x.shape


def test_vqvae_generate_and_sample_raises():
    model = VQVAE(embedding_dim=4, num_embeddings=16, hidden_dims=(8, 16))
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    recon = model.apply(variables, x, method=VQVAE.generate)
    assert recon.shape == x.shape
    with pytest.raises(NotImplementedError):
        model.apply(variables, jax.random.key(1), 2, method=VQVAE.sample)
