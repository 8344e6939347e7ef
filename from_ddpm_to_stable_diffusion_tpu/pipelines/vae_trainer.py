"""VAE / VQ-VAE training pipeline (stage 03 capability).

TPU-native re-design of /root/reference/03_variational_autoencoder/
02_train_vae.py:11-83: AdamW(wd=1e-4), per-epoch loss, best-loss checkpoint,
per-epoch reconstruction grids — as one jitted, donated, DP-sharded step.

The reference trains on the AFHQ *val* split and previews on *train*
(02_train_vae.py:15-16) — an accident we do not reproduce: ``fit`` takes a
train loader and an optional preview batch explicitly.
"""

from __future__ import annotations

import time
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..models.vae import VanillaVAE, VQVAE
from ..parallel import build_mesh, replicate, shard_batch
from ..utils.config import VAETrainConfig
from ..utils.dtypes import POLICIES
from ..utils.logging import MetricsLogger


class VAETrainState(train_state.TrainState):
    batch_stats: Any = None


class VAETrainer:
    def __init__(self, config: VAETrainConfig, mesh=None,
                 logger: Optional[MetricsLogger] = None):
        self.cfg = config
        self.mesh = mesh if mesh is not None else build_mesh(None)
        self.logger = logger or MetricsLogger()
        policy = POLICIES[config.dtype]
        if config.model == "vanilla":
            self.model = VanillaVAE(
                image_size=config.img_size, latent_dim=config.latent_dim,
                dtype=policy.compute_dtype)
        elif config.model == "vqvae":
            self.model = VQVAE(
                embedding_dim=config.embedding_dim,
                num_embeddings=config.num_embeddings,
                dtype=policy.compute_dtype)
        else:
            raise ValueError(f"unknown VAE model {config.model!r}")
        self._train_step = None

    def create_state(self) -> VAETrainState:
        cfg = self.cfg
        x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        rngs = {"params": jax.random.key(cfg.seed),
                "latent": jax.random.key(cfg.seed + 1)}
        variables = self.model.init(rngs, x)
        tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        state = VAETrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats"))
        return replicate(self.mesh, state)

    def _build_train_step(self):
        cfg = self.cfg
        model = self.model
        is_vanilla = cfg.model == "vanilla"

        def step_fn(state: VAETrainState, images, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                if is_vanilla:
                    variables = {"params": params,
                                 "batch_stats": state.batch_stats}
                    (recon, mu, log_var), updates = model.apply(
                        variables, images, train=True,
                        rngs={"latent": rng}, mutable=["batch_stats"])
                    metrics = VanillaVAE.loss(recon, images, mu, log_var,
                                              cfg.kld_weight)
                    return metrics["loss"], (metrics, updates)
                recon, vq_loss, _ = model.apply({"params": params}, images)
                metrics = VQVAE.loss(recon, images, vq_loss)
                return metrics["loss"], (metrics, None)

            grads, (metrics, updates) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            if updates is not None:
                state = state.replace(batch_stats=updates["batch_stats"])
            return state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    def train_step(self, state, images, rng):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        images = shard_batch(self.mesh, images)
        return self._train_step(state, images, rng)

    def reconstruct(self, state: VAETrainState, images):
        """Deterministic reconstruction for preview grids."""
        images = jnp.asarray(images)
        if self.cfg.model == "vanilla":
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            recon, _, _ = self.model.apply(
                variables, images, rngs={"latent": jax.random.key(0)})
            return recon
        recon, _, _ = self.model.apply({"params": state.params}, images)
        return recon

    def fit(self, loader: Iterable, state: Optional[VAETrainState] = None,
            epochs: Optional[int] = None,
            checkpoint_dir: Optional[str] = None,
            preview_batch=None, preview_dir: Optional[str] = None):
        cfg = self.cfg
        if state is None:
            state = self.create_state()
        rng = jax.random.key(cfg.seed + 2)
        ckpt = None
        if checkpoint_dir:
            from ..utils.checkpoint import CheckpointManager

            ckpt = CheckpointManager(checkpoint_dir)
        from ..utils.checkpoint import PreemptionGuard

        best = float("inf")
        with PreemptionGuard() as guard:
            for epoch in range(epochs or cfg.epoch):
                t0 = time.perf_counter()
                total, count = 0.0, 0
                for batch in loader:
                    images = batch[0] if isinstance(batch, tuple) else batch
                    state, metrics = self.train_step(state, images, rng)
                    total += float(metrics["loss"])
                    count += 1
                    if guard.should_stop:
                        break
                if guard.should_stop:
                    if ckpt:
                        ckpt.save(epoch, jax.device_get(state), force=True)
                    self.logger.log("preempted", epoch=epoch)
                    break
                loss = total / max(count, 1)
                self.logger.log("epoch", epoch=epoch, loss=loss,
                                sec=round(time.perf_counter() - t0, 2))
                if ckpt and loss < best:
                    best = loss
                    ckpt.save(epoch, jax.device_get(state))
                if preview_batch is not None and preview_dir:
                    self._save_preview(state, preview_batch, preview_dir,
                                       epoch)
        return state

    def _save_preview(self, state, images, out_dir, epoch):
        import os

        from PIL import Image

        from ..ops.image import image_grid, to_uint8

        recon = self.reconstruct(state, images)
        pair = np.concatenate([np.asarray(images), np.asarray(recon)])
        grid = image_grid(np.asarray(to_uint8(jnp.asarray(pair))),
                          nrow=len(images))
        os.makedirs(out_dir, exist_ok=True)
        Image.fromarray(grid).save(
            os.path.join(out_dir, f"recon_epoch{epoch:03d}.png"))
