"""CLIP contrastive training (stage 05 capability, completed).

The reference builds CLIP/SigLIP towers but never trains them
(05_clip/01_check.py runs shape checks only). This trainer closes the loop:
symmetric InfoNCE over cosine logits (or the SigLIP sigmoid loss), AdamW,
logit-scale clamped to ln(100) as in the original CLIP recipe, DP-sharded
over the mesh.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..models.clip import CLIP, clip_contrastive_loss
from ..parallel import build_mesh, replicate, shard_batch
from ..utils.logging import MetricsLogger

MAX_LOGIT_SCALE = float(np.log(100.0))


class CLIPTrainer:
    def __init__(self, model: CLIP, lr: float = 1e-4,
                 weight_decay: float = 0.1, mesh=None,
                 logger: Optional[MetricsLogger] = None, seed: int = 0):
        self.model = model
        self.mesh = mesh if mesh is not None else build_mesh(None)
        self.logger = logger or MetricsLogger()
        self.lr = lr
        self.weight_decay = weight_decay
        self.seed = seed
        self._train_step = None

    def create_state(self, image_shape, text_len: int):
        img = jnp.zeros((1, *image_shape))
        txt = jnp.zeros((1, text_len), jnp.int32)
        params = self.model.init(jax.random.key(self.seed), img, txt)["params"]
        tx = optax.adamw(self.lr, weight_decay=self.weight_decay)
        state = train_state.TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx)
        return replicate(self.mesh, state)

    def _build_train_step(self):
        model = self.model

        def step_fn(state, images, tokens):
            def loss_fn(params):
                logits_per_image, _ = model.apply({"params": params}, images,
                                                  tokens)
                return clip_contrastive_loss(logits_per_image)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            # clamp the temperature like the original CLIP training recipe
            clamped = jnp.minimum(state.params["logit_scale"],
                                  MAX_LOGIT_SCALE)
            state = state.replace(
                params={**state.params, "logit_scale": clamped})
            return state, loss

        return jax.jit(step_fn, donate_argnums=(0,))

    def train_step(self, state, images, tokens):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        images, tokens = shard_batch(self.mesh, (images, tokens))
        return self._train_step(state, images, tokens)

    def fit(self, loader: Iterable, state=None, epochs: int = 1,
            image_shape=(224, 224, 3), text_len: int = 77,
            checkpoint_dir=None):
        if state is None:
            state = self.create_state(image_shape, text_len)
        ckpt = None
        if checkpoint_dir:
            from ..utils.checkpoint import CheckpointManager

            ckpt = CheckpointManager(checkpoint_dir)
        from ..utils.checkpoint import PreemptionGuard

        best = float("inf")
        with PreemptionGuard() as guard:
            for epoch in range(epochs):
                t0 = time.perf_counter()
                total, count = 0.0, 0
                for images, tokens in loader:
                    state, loss = self.train_step(state, images, tokens)
                    total += float(loss)
                    count += 1
                    if guard.should_stop:
                        break
                if guard.should_stop:
                    if ckpt:
                        ckpt.save(epoch, jax.device_get(state), force=True)
                    self.logger.log("preempted", epoch=epoch)
                    break
                epoch_loss = total / max(count, 1)
                self.logger.log("epoch", epoch=epoch, loss=epoch_loss,
                                sec=round(time.perf_counter() - t0, 2))
                if ckpt and epoch_loss < best:
                    best = epoch_loss
                    ckpt.save(epoch, jax.device_get(state))
        return state
