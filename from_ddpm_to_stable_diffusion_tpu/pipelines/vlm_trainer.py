"""TinyVLM training loop (stage 07⁺ — trainable multimodal counterpart).

Mirrors the framework trainer pattern (clip_trainer.py): AdamW +
warmup-cosine, jitted donated train step, DP batch sharding over the mesh,
checkpoint/preemption support.  ``caption_accuracy`` is the e2e metric:
exact-match greedy captions against the dataset's ground truth.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..models.tiny_vlm import TinyVLM, greedy_decode, vlm_loss
from ..parallel import build_mesh, replicate, shard_batch
from ..utils.logging import MetricsLogger


class VLMTrainer:
    def __init__(self, model: TinyVLM, lr: float = 3e-4,
                 weight_decay: float = 0.01, warmup_steps: int = 100,
                 total_steps: int = 2000, mesh=None,
                 logger: Optional[MetricsLogger] = None, seed: int = 0,
                 answer_start: int = 0):
        self.model = model
        self.answer_start = answer_start  # VQA: mask question targets
        self.mesh = mesh if mesh is not None else build_mesh(None)
        self.logger = logger or MetricsLogger()
        self.schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1),
            end_value=lr * 0.1)
        self.weight_decay = weight_decay
        self.seed = seed
        self._train_step = None

    def create_state(self, image_size: int):
        img = jnp.zeros((1, image_size, image_size, 3))
        txt = jnp.zeros((1, self.model.max_text_len), jnp.int32)
        params = jax.jit(self.model.init)(jax.random.key(self.seed), img,
                                          txt)["params"]
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(self.schedule, weight_decay=self.weight_decay))
        state = train_state.TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx)
        return replicate(self.mesh, state)

    def _build_train_step(self):
        model = self.model
        answer_start = self.answer_start

        def step_fn(state, images, tokens):
            def loss_fn(params):
                logits = model.apply({"params": params}, images, tokens)
                return vlm_loss(logits, tokens, answer_start=answer_start)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        return jax.jit(step_fn, donate_argnums=(0,))

    def train_step(self, state, images, tokens):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        images, tokens = shard_batch(self.mesh, (images, tokens))
        return self._train_step(state, images, tokens)

    def fit(self, loader: Iterable, state=None, epochs: int = 1,
            image_size: int = 64, checkpoint_dir=None):
        if state is None:
            state = self.create_state(image_size)
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

    def caption_accuracy(self, state, dataset, n: int = 64,
                         batch_size: int = 32) -> float:
        """Exact-match greedy-caption accuracy over the first n examples."""
        correct = 0
        for s in range(0, n, batch_size):
            idxs = range(s, min(s + batch_size, n))
            imgs, caps = zip(*(dataset.load(i) for i in idxs))
            got = greedy_decode(self.model, state.params,
                                jnp.asarray(np.stack(imgs)),
                                max_len=self.model.max_text_len)
            for g, want in zip(np.asarray(got), caps):
                if dataset.decode(g) == dataset.decode(want):
                    correct += 1
        return correct / n

    def qa_accuracy(self, state, dataset, n: int = 64,
                    batch_size: int = 32) -> float:
        """Exact-match ANSWER accuracy: decode each held-out example with
        its [BOS | question] prefix and compare the answer span."""
        from ..io.shapes_dataset import VQA_ANSWER_START

        correct = 0
        for s in range(0, n, batch_size):
            idxs = range(s, min(s + batch_size, n))
            imgs, toks = zip(*(dataset.load(i) for i in idxs))
            prompts = np.stack(toks)[:, :VQA_ANSWER_START]
            got = greedy_decode(self.model, state.params,
                                jnp.asarray(np.stack(imgs)),
                                max_len=self.model.max_text_len,
                                prompt_ids=prompts)
            for g, want in zip(np.asarray(got), toks):
                if dataset.decode_answer(g) == dataset.decode_answer(want):
                    correct += 1
        return correct / n
