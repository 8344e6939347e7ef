"""Video diffusion (stage-08 beyond-adapter capability) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.io import (DataLoader,
                                                  SyntheticVideoDataset)
from from_ddpm_to_stable_diffusion_tpu.models.tiny_video_unet import (
    TemporalAttention, TinyVideoUNet)

pytestmark = pytest.mark.slow


def test_video_unet_shapes_and_grads():
    model = TinyVideoUNet(base_channels=32, num_classes=3)
    x = jnp.zeros((2, 4, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.ones((2,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t, y)["params"]
    out = model.apply({"params": params}, x, t, y)
    assert out.shape == x.shape and out.dtype == jnp.float32

    g = jax.grad(lambda p: jnp.sum(
        model.apply({"params": p}, x, t, y) ** 2))(params)
    norms = [float(jnp.linalg.norm(v))
             for v in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    # temporal-attention weights receive gradient
    assert float(jnp.linalg.norm(jax.tree_util.tree_leaves(
        g["enc1_tatt"])[0])) > 0


def test_temporal_attention_mixes_only_time():
    """Changing frame j must not change other spatial positions' frames
    beyond the (b, h, w) column it lives in — temporal attention must not
    leak across space."""
    mod = TemporalAttention(num_heads=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4, 4, 4, 16)), jnp.float32)
    params = mod.init(jax.random.key(0), x)["params"]
    base = mod.apply({"params": params}, x)
    x2 = x.at[0, 1, 2, 3].add(1.0)  # perturb frame 1 at position (2, 3)
    out2 = mod.apply({"params": params}, x2)
    diff = np.abs(np.asarray(out2 - base)).sum(axis=(0, 1, 4))  # over B,T,C
    changed = diff > 1e-6
    assert changed[2, 3], "the perturbed column must change"
    changed[2, 3] = False
    assert not changed.any(), "no other spatial position may change"


def test_video_ddpm_train_and_sample_smoke():
    """End-to-end: the rank-generic DDPM trainer drives the video model —
    loss decreases on moving-shape clips and sampling returns clips."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import (
        DDPMTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig

    frames, size = 4, 16
    cfg = TinySDConfig(epoch=2, batch_size=8, img_size=size, T=20,
                       channel=32, dropout=0.0, dtype="fp32",
                       warmup_epochs=1, num_class=3)
    model = TinyVideoUNet(base_channels=32, num_classes=3)
    trainer = DDPMTrainer(cfg, model=model,
                          sample_shape=(frames, size, size, 3))
    data = DataLoader(SyntheticVideoDataset(32, size, frames=frames), 8)

    state = trainer.create_state(steps_per_epoch=len(data))
    rng = jax.random.key(0)
    losses = []
    for _ in range(2):
        for clips, labels in data:
            state, loss = trainer.train_step(state, clips, labels, rng)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    clips = trainer.sample(state, labels=[1, 2])
    assert clips.shape == (2, frames, size, size, 3)
    assert np.all(np.abs(np.asarray(clips)) <= 1.0)
