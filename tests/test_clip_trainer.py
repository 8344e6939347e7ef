"""CLIP contrastive training smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from from_ddpm_to_stable_diffusion_tpu.models.clip import CLIP
from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
from from_ddpm_to_stable_diffusion_tpu.pipelines.clip_trainer import (
    MAX_LOGIT_SCALE, CLIPTrainer)

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def test_clip_contrastive_training(devices8):
    model = CLIP(embed_dim=16, image_resolution=16, vision_layers=1,
                 vision_width=32, vision_patch_size=8, context_length=8,
                 vocab_size=32, transformer_width=32, transformer_heads=4,
                 transformer_layers=1)
    trainer = CLIPTrainer(model, lr=3e-3,
                          mesh=build_mesh({"data": 8}, jax.devices()[:8]))
    state = trainer.create_state((16, 16, 3), 8)

    rng = np.random.default_rng(0)
    # fixed batch of 8 matched (image, caption) pairs to memorize
    images = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    tokens = rng.integers(1, 31, (8, 8)).astype(np.int32)
    losses = []
    for _ in range(12):
        state, loss = trainer.train_step(state, images, tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9  # memorizing 8 pairs
    # temperature stays clamped
    assert float(state.params["logit_scale"]) <= MAX_LOGIT_SCALE + 1e-6
