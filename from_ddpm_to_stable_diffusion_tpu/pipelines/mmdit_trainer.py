"""Rectified-flow training for the SD3 MMDiT, mesh-sharded.

The reference ships SD3 as inference-only (02_stable_diffusion-3/
sd3_infer.py) and flags the JointBlock as its would-be FSDP unit
(mmdit.py:375); this trainer closes the loop: train the same architecture
with the rectified-flow objective its released checkpoints were trained
with, under any of the framework's sharding modes.

Objective (Esser et al. 2024, matching ModelSamplingDiscreteFlow,
sd3_infer.py:47-79): sample t logit-normally, apply the resolution shift
σ = shift·t/(1+(shift−1)·t), blend x_σ = σ·ε + (1−σ)·x₀, and regress the
model output onto the velocity ε − x₀ — the exact quantity the flow-Euler
sampler consumes (denoised = x − out·σ ⇒ out = (x_σ − x₀)/σ = ε − x₀).
CFG training drops conditioning (context AND pooled y → 0) per example
with probability ``train_rand``, mirroring the tiny-SD label-drop
(06_.../02_train_direct.py:67-69).

Sharding modes (one trainer, GSPMD does the rest):
- DP            — batch sharded over ``data``; grads psum over ICI.
- TP            — ``model`` mesh axis: param-path PartitionSpec rules
                  (parallel/sharding.py) on state AND optimizer moments.
- FSDP (ZeRO)   — ``fsdp=True``: whole train state stored reduce-scattered
                  over ``data`` (parallel/fsdp.py), gathered just-in-time
                  at the top of the loss.
- FSDP×TP       — both: weights stored sharded over data×model, gathered
                  over data only (drop_data_axis) so compute stays
                  model-sharded — the scaling-book hybrid 2-D layout.
- SP            — model_cfg.attention_impl='ring'/'ulysses' shards the
                  joint sequence over ``seq`` inside the blocks.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mmdit import MMDiT, MMDiTConfig
from ..ops import schedules
from ..parallel import build_mesh, replicate, shard_batch
from ..parallel.fsdp import (constrain, drop_data_axis, fsdp_shardings,
                             fsdp_tp_shardings)
from ..parallel.sharding import tp_shardings
from ..samplers.flow import flow_euler_sample
from ..utils.config import FlowTrainConfig
from ..utils.dtypes import POLICIES
from ..utils.logging import MetricsLogger
from .ddpm_trainer import TrainState


class MMDiTTrainer:
    """Train an MMDiT ε→velocity predictor on (latents, context, y) batches.

    Batches: ``latents`` (B, H, W, C) NHWC — VAE-encoded images at
    ``cfg.img_size``; ``context`` (B, Lc, context_dim) text-encoder
    sequence; ``y`` (B, adm) pooled conditioning (pass None when the model
    config disables either).
    """

    def __init__(self, model_cfg: MMDiTConfig, cfg: FlowTrainConfig,
                 mesh=None, fsdp: bool = False,
                 logger: Optional[MetricsLogger] = None,
                 lora_rank: Optional[int] = None, base_params=None,
                 lora_scale: float = 1.0):
        """``lora_rank``: LoRA fine-tuning (utils/lora.py) — freeze
        ``base_params`` (e.g. an imported SD3 checkpoint's MMDiT tree) and
        train rank-r adapters only; under ``fsdp`` the frozen base is ALSO
        stored reduce-scattered (it dominates memory), gathered at use."""
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.fsdp = fsdp
        self.lora_rank = lora_rank
        self.lora_scale = lora_scale
        self._base_params = base_params  # placed on mesh in create_state
        self.mesh = mesh if mesh is not None else build_mesh(cfg.mesh_shape)
        self.tp = self.mesh.shape.get("model", 1) > 1
        self.logger = logger or MetricsLogger()
        policy = POLICIES[cfg.dtype]
        sp = model_cfg.attention_impl in ("ring", "ulysses")
        self.model = MMDiT(config=model_cfg, dtype=policy.compute_dtype,
                           mesh=self.mesh if sp else None)
        self._state_shardings = None
        self._gather_shardings = None
        self._train_step = None
        self._sample_fn = {}

    # ---------------- state ----------------
    def _dummy_inputs(self, batch: int = 1):
        mc = self.model_cfg
        x = jnp.zeros((batch, self.cfg.img_size, self.cfg.img_size,
                       mc.in_channels))
        t = jnp.zeros((batch,), jnp.float32)
        y = (jnp.zeros((batch, mc.adm_in_channels))
             if mc.adm_in_channels else None)
        ctx = (jnp.zeros((batch, self.cfg.context_len, mc.context_dim))
               if mc.context_dim else None)
        return x, t, y, ctx

    def create_state(self, steps_per_epoch: int, rng=None) -> TrainState:
        cfg = self.cfg
        if rng is None:
            rng = jax.random.key(cfg.seed)
        x, t, y, ctx = self._dummy_inputs()
        params = jax.jit(self.model.init)(rng, x, t, y, ctx)["params"]
        if self.lora_rank:
            from ..utils.lora import init_lora

            base = self._base_params if self._base_params is not None \
                else params
            if self.fsdp:
                from ..parallel.fsdp import apply_fsdp

                self._base_params = apply_fsdp(base, self.mesh)
            else:
                self._base_params = replicate(self.mesh, base)
            params = init_lora(jax.random.fold_in(rng, 1), base,
                               rank=self.lora_rank)
        accum = max(1, getattr(cfg, "grad_accum", 1))
        lr = schedules.cosine_warmup_lr(cfg.lr, cfg.max_lr, cfg.warmup_epochs,
                                        cfg.epoch,
                                        max(1, steps_per_epoch // accum))
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                         optax.adamw(lr))
        if not self.tp and not self.fsdp:
            # fused single-vector update (see ddpm_trainer for the
            # measurement); per-leaf otherwise so moment shardings can
            # follow the param-path / shape rules
            tx = optax.flatten(tx)
        if accum > 1:
            # average the micro-grads; one optimizer update per window
            # (clipping sees the full-window gradient)
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        # EMA starts at the params' VALUES but must not alias their
        # BUFFERS: the donated train step would otherwise donate the same
        # buffer twice (latent until a step leaves params untouched, e.g.
        # a grad-accumulation micro-step). One jitted copy program.
        ema0 = (jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))(
            params) if cfg.ema_decay else None)
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx,
            ema_params=ema0)
        if self.fsdp and self.tp:
            self._state_shardings = fsdp_tp_shardings(state, self.mesh)
        elif self.fsdp:
            self._state_shardings = fsdp_shardings(state, self.mesh)
        elif self.tp:
            # path-rule TP on params + moments + EMA (scalars replicate)
            self._state_shardings = tp_shardings(state, self.mesh)
        if self._state_shardings is None:
            return replicate(self.mesh, state)
        if self.fsdp:
            self._gather_shardings = drop_data_axis(
                self._state_shardings.params)
        return jax.tree_util.tree_map(jax.device_put, state,
                                      self._state_shardings)

    def num_params(self, state: TrainState) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))

    # ---------------- train ----------------
    def _sigma_of_t(self, t):
        s = self.cfg.shift
        return s * t / (1.0 + (s - 1.0) * t)

    def _build_train_step(self):
        cfg = self.cfg
        model = self.model
        has_y = self.model_cfg.adm_in_channels is not None
        has_ctx = self.model_cfg.context_dim is not None

        def step_fn(state: TrainState, base, latents, context, y, rng):
            rng = jax.random.fold_in(rng, state.step)
            t_key, n_key, drop_key = jax.random.split(rng, 3)
            b = latents.shape[0]
            # logit-normal timestep density (SD3 recipe): heavier mass at
            # mid-σ where the velocity target is hardest
            t_lin = jax.nn.sigmoid(jax.random.normal(t_key, (b,)))
            sigma = self._sigma_of_t(t_lin)
            timestep = sigma * cfg.num_timesteps
            noise = jax.random.normal(n_key, latents.shape)
            sig = sigma[:, None, None, None]
            x_sigma = sig * noise + (1.0 - sig) * latents
            target = noise - latents
            drop = jax.random.uniform(drop_key, (b,)) < cfg.train_rand
            ctx = (jnp.where(drop[:, None, None], 0.0, context)
                   if has_ctx else None)
            yy = jnp.where(drop[:, None], 0.0, y) if has_y else None

            def loss_fn(params):
                if self._gather_shardings is not None:
                    # ZeRO: gather over data just-in-time (model axis, if
                    # any, stays sharded); the constraint's transpose
                    # reduce-scatters the grads back to storage layout
                    params = constrain(params, self._gather_shardings)
                if self.lora_rank:
                    from ..utils.lora import merge_lora

                    params = merge_lora(base, params, self.lora_scale)
                if self.model_cfg.moe_experts:
                    out, mut = model.apply(
                        {"params": params}, x_sigma, timestep, yy, ctx,
                        mutable=["losses"])
                    aux = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(
                        mut["losses"]))
                    return (jnp.mean(jnp.square(out - target))
                            + cfg.moe_aux_weight * aux)
                out = model.apply({"params": params}, x_sigma, timestep,
                                  yy, ctx)
                return jnp.mean(jnp.square(out - target))

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            if cfg.ema_decay:
                d = cfg.ema_decay
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params, state.params)
                mini = getattr(state.opt_state, "mini_step", None)
                if mini is not None:
                    # grad accumulation: advance the EMA only when
                    # MultiSteps actually applied an update (its mini_step
                    # resets to 0 right after an emit). Derived from the
                    # optimizer's OWN counter — state.step % accum
                    # desynchronizes on warm starts whose step is not a
                    # window multiple.
                    new_ema = jax.tree_util.tree_map(
                        lambda n, e: jnp.where(mini == 0, n, e),
                        new_ema, state.ema_params)
                state = state.replace(ema_params=new_ema)
            if self._state_shardings is not None:
                # store the updated state in its sharded layout so
                # donation reuses the input buffers exactly
                state = constrain(state, self._state_shardings)
            return state, loss

        return jax.jit(step_fn, donate_argnums=(0,))

    def train_step(self, state, latents, context, y, rng):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        latents, context, y = shard_batch(self.mesh, (latents, context, y))
        return self._train_step(state, self._base_params, latents, context,
                                y, rng)

    def fit(self, loader: Iterable, state: Optional[TrainState] = None,
            epochs: Optional[int] = None,
            checkpoint_dir: Optional[str] = None):
        """Epoch loop over (latents, context, y) batches with Orbax
        checkpointing + preemption save, mirroring DDPMTrainer.fit."""
        cfg = self.cfg
        if state is None:
            state = self.create_state(steps_per_epoch=len(loader))
        rng = jax.random.key(cfg.seed + 1)
        ckpt = None
        start_epoch = 0
        if checkpoint_dir:
            from ..utils.checkpoint import CheckpointManager

            ckpt = CheckpointManager(checkpoint_dir)
            if cfg.epoch_awoken or ckpt.latest_step is not None:
                restored, at = ckpt.restore(cfg.epoch_awoken, template=state)
                if restored is not None:
                    state, start_epoch = restored, at
                    self.logger.log("resume", epoch=at)
        from ..io.data import prefetch_to_device
        from ..utils.checkpoint import PreemptionGuard

        best_loss = float("inf")
        with PreemptionGuard() as guard:
            for epoch in range(start_epoch, epochs or cfg.epoch):
                t0 = time.perf_counter()
                total, count = 0.0, 0
                for latents, context, y in prefetch_to_device(loader,
                                                              self.mesh):
                    state, loss = self.train_step(state, latents, context,
                                                  y, rng)
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
                dt = time.perf_counter() - t0
                self.logger.log("epoch", epoch=epoch, loss=epoch_loss,
                                sec=round(dt, 2))
                if ckpt and epoch_loss < best_loss:
                    best_loss = epoch_loss
                    ckpt.save(epoch, jax.device_get(state))
        return state

    # ---------------- sample ----------------
    def sample(self, state: TrainState, context, y, rng=None,
               steps: Optional[int] = None, use_ema: bool = False):
        """CFG flow-Euler sampling from a trained state.

        Uncond = zeroed conditioning (the training-drop convention);
        batched cond/uncond in one forward like CFGDenoiser
        (sd3_infer.py:129-137). Returns (B, H, W, C) latents.
        """
        cfg = self.cfg
        mc = self.model_cfg
        if rng is None:
            rng = jax.random.key(cfg.seed + 2)
        steps = steps or cfg.sample_steps
        b = (context.shape[0] if context is not None else y.shape[0])
        key = (b, steps, use_ema)
        if key not in self._sample_fn:

            @jax.jit
            def sample_fn(params, base, context, y, rng):
                if self.lora_rank:
                    from ..utils.lora import merge_lora

                    params = merge_lora(base, params, self.lora_scale)
                x = jax.random.normal(
                    rng, (b, cfg.img_size, cfg.img_size, mc.in_channels))
                ctx2 = (jnp.concatenate([context, jnp.zeros_like(context)])
                        if context is not None else None)
                y2 = (jnp.concatenate([y, jnp.zeros_like(y)])
                      if y is not None else None)

                def denoise(xt, sigma):
                    xx = jnp.concatenate([xt, xt])
                    tt = jnp.full((2 * b,), sigma * cfg.num_timesteps)
                    out = self.model.apply({"params": params}, xx, tt,
                                           y2, ctx2)
                    cond, uncond = jnp.split(out, 2, axis=0)
                    v = uncond + cfg.w * (cond - uncond)
                    return xt - v * sigma

                sig = schedules.sd3_sigma_schedule(
                    steps, cfg.shift, cfg.num_timesteps)
                return flow_euler_sample(denoise, x, steps=steps,
                                         sigmas=sig)

            self._sample_fn[key] = sample_fn
        params = state.ema_params if (use_ema and state.ema_params
                                      is not None) else state.params
        return self._sample_fn[key](params, self._base_params, context, y,
                                    rng)
