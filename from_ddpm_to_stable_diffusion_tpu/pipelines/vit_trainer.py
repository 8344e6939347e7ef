"""ViT classification training (stage 04 capability).

TPU-native re-design of /root/reference/04_vision_transformer/
01_train_classification.py:11-62: AdamW + cross-entropy, per-epoch val
accuracy — as one jitted donated train step, DP-sharded over the mesh.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..models.vit import ViT
from ..parallel import build_mesh, replicate, shard_batch
from ..utils.config import ViTTrainConfig
from ..utils.dtypes import POLICIES
from ..utils.logging import MetricsLogger


class ViTTrainer:
    def __init__(self, config: ViTTrainConfig, mesh=None,
                 logger: Optional[MetricsLogger] = None):
        self.cfg = config
        self.mesh = mesh if mesh is not None else build_mesh(None)
        self.logger = logger or MetricsLogger()
        policy = POLICIES[config.dtype]
        self.model = ViT(
            image_size=config.img_size, patch_size=config.patch_size,
            num_classes=config.num_class, dim=config.dim,
            depth=config.depth, heads=config.heads, mlp_dim=config.mlp_dim,
            dropout=config.dropout, emb_dropout=config.emb_dropout,
            dtype=policy.compute_dtype)
        self._train_step = None
        self._eval_step = None

    def create_state(self):
        cfg = self.cfg
        x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        params = self.model.init(jax.random.key(cfg.seed), x)["params"]
        tx = optax.adamw(cfg.lr)
        state = train_state.TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx)
        return replicate(self.mesh, state)

    def _build_steps(self):
        model = self.model

        def train_step(state, images, labels, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                logits = model.apply({"params": params}, images,
                                     deterministic=False,
                                     rngs={"dropout": rng})
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
                acc = jnp.mean(jnp.argmax(logits, -1) == labels)
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads=grads), loss, acc

        def eval_step(params, images, labels):
            logits = model.apply({"params": params}, images)
            return jnp.sum(jnp.argmax(logits, -1) == labels)

        return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))

    def train_step(self, state, images, labels, rng):
        if self._train_step is None:
            self._train_step, self._eval_step = self._build_steps()
        images, labels = shard_batch(self.mesh, (images, labels))
        return self._train_step(state, images, labels, rng)

    def evaluate(self, state, loader: Iterable) -> float:
        if self._eval_step is None:
            self._train_step, self._eval_step = self._build_steps()
        correct, total = 0, 0
        for images, labels in loader:
            images, labels = shard_batch(self.mesh, (images, labels))
            correct += int(self._eval_step(state.params, images, labels))
            total += len(labels)
        return correct / max(total, 1)

    def fit(self, train_loader: Iterable, val_loader: Optional[Iterable] = None,
            state=None, epochs: Optional[int] = None,
            checkpoint_dir: Optional[str] = None):
        cfg = self.cfg
        if state is None:
            state = self.create_state()
        rng = jax.random.key(cfg.seed + 1)
        ckpt = None
        if checkpoint_dir:
            from ..utils.checkpoint import CheckpointManager

            ckpt = CheckpointManager(checkpoint_dir)
        from ..utils.checkpoint import PreemptionGuard

        best_acc = -1.0
        with PreemptionGuard() as guard:
            for epoch in range(epochs or cfg.epoch):
                t0 = time.perf_counter()
                total, count = 0.0, 0
                for images, labels in train_loader:
                    state, loss, acc = self.train_step(state, images, labels,
                                                       rng)
                    total += float(loss)
                    count += 1
                    if guard.should_stop:
                        break
                if guard.should_stop:
                    if ckpt:
                        ckpt.save(epoch, jax.device_get(state), force=True)
                    self.logger.log("preempted", epoch=epoch)
                    break
                metrics = dict(epoch=epoch, loss=total / max(count, 1),
                               sec=round(time.perf_counter() - t0, 2))
                if val_loader is not None:
                    metrics["val_acc"] = round(
                        self.evaluate(state, val_loader), 4)
                self.logger.log("epoch", **metrics)
                if ckpt and metrics.get("val_acc", 0.0) > best_acc:
                    best_acc = metrics.get("val_acc", 0.0)
                    ckpt.save(epoch, jax.device_get(state))
        return state
