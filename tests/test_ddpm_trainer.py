"""End-to-end tiny-DDPM training smoke tests on the fake 8-device CPU mesh."""

import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.io import DataLoader, SyntheticImageDataset
from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import DDPMTrainer
from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


@pytest.fixture(scope="module")
def tiny_cfg():
    return TinySDConfig(
        epoch=2, batch_size=8, img_size=16, img_channel=3, num_class=3,
        T=10, channel=32, channel_multy=[1, 2, 2, 2], dropout=0.0,
        lr=1e-4, max_lr=1e-3, warmup_epochs=1, train_rand=0.1, w=1.8,
        dtype="fp32", seed=0)


def test_train_smoke_loss_decreases(tiny_cfg, devices8):
    mesh = build_mesh({"data": 8}, devices8)
    trainer = DDPMTrainer(tiny_cfg, mesh=mesh)
    ds = SyntheticImageDataset(n=32, img_size=16, num_classes=3)
    loader = DataLoader(ds, batch_size=8, seed=0)
    import jax

    state = trainer.create_state(steps_per_epoch=len(loader))
    rng = jax.random.key(1)
    losses = []
    for _ in range(2):
        for images, labels in loader:
            state, loss = trainer.train_step(state, images, labels, rng)
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    # loss trends down over 8 steps of memorizing 32 images
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_sampling_shape_and_range(tiny_cfg, devices8):
    mesh = build_mesh({"data": 8}, devices8)
    trainer = DDPMTrainer(tiny_cfg, mesh=mesh)
    state = trainer.create_state(steps_per_epoch=4)
    out = trainer.sample(state, labels=np.asarray([1, 2, 3, 1, 2, 3, 1, 2]))
    a = np.asarray(out)
    assert a.shape == (8, 16, 16, 3)
    assert np.all(np.isfinite(a)) and a.min() >= -1 and a.max() <= 1


def test_checkpoint_roundtrip(tiny_cfg, tmp_path):
    import jax

    trainer = DDPMTrainer(tiny_cfg)
    state = trainer.create_state(steps_per_epoch=4)
    from from_ddpm_to_stable_diffusion_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, jax.device_get(state))
    restored, step = mgr.restore(template=jax.device_get(state))
    assert step == 0
    orig = jax.tree_util.tree_leaves(jax.device_get(state.params))
    back = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_preemption_guard_saves_and_stops(tmp_path):
    """SIGTERM mid-fit must save a resumable checkpoint and exit cleanly."""
    import os
    import signal
    import threading

    from from_ddpm_to_stable_diffusion_tpu.io import (DataLoader,
                                                      SyntheticImageDataset)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import (
        DDPMTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig

    cfg = TinySDConfig(epoch=500, batch_size=8, img_size=16, T=10,
                       channel=32, dropout=0.0, dtype="fp32",
                       warmup_epochs=1)
    trainer = DDPMTrainer(cfg)
    loader = DataLoader(SyntheticImageDataset(16, 16), 8)
    # pay the train-step compile up front so the SIGTERM below lands
    # inside fit's PreemptionGuard window, not during compilation (where
    # the default handler would kill the process). The warmup state is a
    # THROWAWAY: train_step donates its state argument, so the buffers
    # are dead afterwards.
    warm = trainer.create_state(steps_per_epoch=2)
    for images, labels in loader:
        trainer.train_step(warm, images, labels,
                           __import__("jax").random.key(0))
        break
    state0 = trainer.create_state(steps_per_epoch=2)

    # deliver SIGTERM shortly after training starts; the 500-epoch fit
    # must return early instead of running to completion
    killer = threading.Timer(8.0, lambda: os.kill(os.getpid(),
                                                  signal.SIGTERM))
    killer.start()
    try:
        state = trainer.fit(loader, state=state0,
                            checkpoint_dir=str(tmp_path))
    finally:
        killer.cancel()
    assert state is not None
    from from_ddpm_to_stable_diffusion_tpu.utils.checkpoint import (
        CheckpointManager)

    assert CheckpointManager(str(tmp_path)).latest_step is not None


def test_grad_accumulation_window_semantics():
    """grad_accum=k: params are FROZEN during the first k-1 micro-steps of
    a window, move on the k-th (optax.MultiSteps averages the window's
    gradients), EMA only advances when params do, and training still
    learns."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = TinySDConfig(
        epoch=4, batch_size=8, img_size=16, img_channel=3, num_class=3,
        T=10, channel=32, channel_multy=[1, 2, 2, 2], dropout=0.0,
        lr=1e-4, max_lr=1e-3, warmup_epochs=1, train_rand=0.0, w=1.8,
        dtype="fp32", seed=0, grad_accum=2, ema_decay=0.9)
    trainer = DDPMTrainer(cfg)
    ds = SyntheticImageDataset(n=16, img_size=16, num_classes=3)
    loader = DataLoader(ds, batch_size=8, seed=0)
    state = trainer.create_state(steps_per_epoch=len(loader))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    rng = jax.random.key(1)
    batches = list(loader)

    # micro-step 1: accumulating — params and EMA must NOT move
    state, _ = trainer.train_step(state, *batches[0], rng)
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    e1 = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(p0))

    # micro-step 2: window closes — params move, EMA follows
    state, _ = trainer.train_step(state, *batches[1], rng)
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    e2 = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.array_equal(np.asarray(p2), np.asarray(p0))
    np.testing.assert_allclose(
        np.asarray(e2), 0.9 * np.asarray(p0) + 0.1 * np.asarray(p2),
        rtol=1e-6)

    # still learns end to end
    losses = []
    for _ in range(4):
        for images, labels in loader:
            state, loss = trainer.train_step(state, images, labels, rng)
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
