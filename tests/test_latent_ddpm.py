"""Latent-space tiny-SD training (stage 06's 03_train_with_vae variant)."""

import jax
import jax.numpy as jnp
import numpy as np

from from_ddpm_to_stable_diffusion_tpu.io import DataLoader, SyntheticImageDataset
from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import DDPMTrainer
from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def _stub_encode(images, rng):
    """(B, 32, 32, 3) -> (B, 8, 8, 4): avg-pool ×4 + a noise channel."""
    b, h, w, _ = images.shape
    pooled = images.reshape(b, h // 4, 4, w // 4, 4, 3).mean(axis=(2, 4))
    extra = jax.random.normal(rng, pooled[..., :1].shape) * 0.01
    return jnp.concatenate([pooled, extra], axis=-1)


def _stub_decode(latents):
    """(B, 8, 8, 4) -> (B, 32, 32, 3) nearest-upsample of the RGB channels."""
    rgb = latents[..., :3]
    b, h, w, c = rgb.shape
    up = jnp.broadcast_to(rgb[:, :, None, :, None, :], (b, h, 4, w, 4, c))
    return up.reshape(b, 4 * h, 4 * w, c)


def test_latent_ddpm_train_and_sample(devices8):
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh

    cfg = TinySDConfig(
        epoch=1, batch_size=8, img_size=8, img_channel=4, num_class=3,
        T=10, channel=32, channel_multy=[1, 2, 2, 2], dropout=0.0,
        lr=1e-4, max_lr=1e-3, warmup_epochs=1, dtype="fp32", w=1.8)
    trainer = DDPMTrainer(cfg, mesh=build_mesh({"data": 8}, devices8),
                          latent_encode_fn=_stub_encode,
                          latent_decode_fn=_stub_decode)
    ds = SyntheticImageDataset(n=16, img_size=32)
    loader = DataLoader(ds, batch_size=8)
    state = trainer.create_state(steps_per_epoch=len(loader))
    rng = jax.random.key(0)
    losses = []
    for _ in range(2):
        for images, labels in loader:
            state, loss = trainer.train_step(state, images, labels, rng)
            losses.append(float(loss))
    assert all(np.isfinite(losses))

    out = trainer.sample(state, labels=np.asarray([1, 2, 3, 1]))
    # decoded back to pixel space by latent_decode_fn
    assert out.shape == (4, 32, 32, 3)
    a = np.asarray(out)
    assert np.all(np.isfinite(a)) and a.min() >= -1.0 and a.max() <= 1.0
