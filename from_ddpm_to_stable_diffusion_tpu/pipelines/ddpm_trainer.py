"""Tiny-SD (stage 06) DDPM training + sampling pipeline, mesh-sharded.

TPU-native re-design of /root/reference/06_tiny_stable_diffusion/
02_train_direct.py:12-98 + utils.py:96-171:

- ONE jitted, donated train step: q-sample + UNet fwd/bwd + optax
  clip→AdamW update. Data-parallel over the mesh ``data`` axis via
  NamedSharding (XLA inserts the grad psum over ICI).
- Label semantics preserved exactly: labels+1, uniform drop→0 with
  p=train_rand for CFG training (02_train_direct.py:67-69); loss
  ``sum()/batch²`` (:70); grad-clip 1.0 (:72).
- Per-epoch CFG sampling grid via the ``lax.scan`` ancestral sampler.
- Optional EMA as an optax transform (the reference defines an EMA helper it
  never wires in, utils.py:42-72; here it's a config flag).
- Checkpoint/resume is first-class (Orbax), mirroring ``epoch_awoken``.
"""

from __future__ import annotations

import time
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..models.tiny_unet import TinyUNet
from ..ops import schedules
from ..parallel import build_mesh, replicate, shard_batch
from ..samplers.ddpm import ddpm_loss, ddpm_sample
from ..utils.config import TinySDConfig
from ..utils.dtypes import POLICIES
from ..utils.logging import MetricsLogger


class TrainState(train_state.TrainState):
    ema_params: Optional[Any] = None


class DDPMTrainer:
    """Pixel-space (02_train_direct.py) or latent-space (03_train_with_vae.py)
    DDPM training.

    For latent-space training pass ``latent_encode_fn(images, rng) ->
    latents`` (e.g. a frozen VAE encoder) and ``latent_decode_fn(latents) ->
    images``; set ``config.img_channel`` to the latent channel count and
    ``config.img_size`` to the LATENT spatial size (the reference's latent
    variant trains at img 512 → latent 64, channel_img 4,
    03_train_with_vae.py:36,69).
    """

    def __init__(self, config: TinySDConfig, mesh=None,
                 logger: Optional[MetricsLogger] = None,
                 latent_encode_fn=None, latent_decode_fn=None,
                 model=None, sample_shape=None, fsdp: bool = False,
                 lora_rank: Optional[int] = None, base_params=None,
                 lora_scale: float = 1.0):
        """``model``: any ε-predictor with ``apply(vars, x, t, labels,
        deterministic=, rngs=)`` — defaults to the stage-06 TinyUNet; pass
        e.g. ``models.tiny_video_unet.TinyVideoUNet`` with
        ``sample_shape=(T, H, W, C)`` for clip-shaped data (the DDPM
        machinery is rank-generic).

        ``fsdp``: store the train state (params + optimizer moments + EMA)
        sharded over the mesh ``data`` axis (ZeRO; see parallel/fsdp.py) —
        XLA gathers weights just-in-time and reduce-scatters grads. Use
        when params*3 optimizer copies would not fit one chip.

        ``lora_rank``: LoRA fine-tuning (utils/lora.py) — freeze the base
        weights (``base_params``, e.g. an imported checkpoint; defaults to
        a fresh init) and train only rank-r adapters on the attention/MLP
        kernels. ``state.params`` is then the flat adapter dict; the merge
        W + (scale/r)·A·B happens inside the jitted step/sample."""
        self.cfg = config
        self.fsdp = fsdp
        self.lora_rank = lora_rank
        self.lora_scale = lora_scale
        self._base_params = base_params  # placed on mesh in create_state
        self._state_shardings = None
        self.mesh = mesh if mesh is not None else build_mesh(config.mesh_shape)
        self.logger = logger or MetricsLogger()
        self.latent_encode_fn = latent_encode_fn
        self.latent_decode_fn = latent_decode_fn
        policy = POLICIES[config.dtype]
        self.model = model if model is not None else TinyUNet(
            out_channels=config.img_channel,
            base_channels=config.channel,
            channel_mult=tuple(config.channel_multy),
            num_classes=config.num_class,
            dropout=config.dropout,
            dtype=policy.compute_dtype,
        )
        self.sample_shape = tuple(sample_shape) if sample_shape else (
            config.img_size, config.img_size, config.img_channel)
        self.tables = schedules.ddpm_tables(config.beta_1, config.beta_T,
                                            config.T)
        self._train_step = None
        self._sample_fn = {}

    # ---------------- state ----------------
    def create_state(self, steps_per_epoch: int, rng=None) -> TrainState:
        cfg = self.cfg
        if rng is None:
            rng = jax.random.key(cfg.seed)
        x = jnp.zeros((1,) + self.sample_shape)
        # jitted init: one compiled program, not hundreds of eager
        # single-op dispatches (slow on the remote-compile tunnel)
        params = jax.jit(self.model.init)(
            rng, x, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32))["params"]
        if self.lora_rank:
            from ..utils.lora import init_lora

            base = self._base_params if self._base_params is not None \
                else params
            if self.fsdp:
                # the frozen base dominates memory — store it
                # reduce-scattered too; XLA gathers it at the merge
                from ..parallel.fsdp import apply_fsdp

                self._base_params = apply_fsdp(base, self.mesh)
            else:
                self._base_params = replicate(self.mesh, base)
            params = init_lora(jax.random.fold_in(rng, 1), base,
                               rank=self.lora_rank)
        accum = max(1, getattr(cfg, "grad_accum", 1))
        # the inner schedule counts OPTIMIZER updates — one per accum window
        lr = schedules.cosine_warmup_lr(cfg.lr, cfg.max_lr, cfg.warmup_epochs,
                                        cfg.epoch,
                                        max(1, steps_per_epoch // accum))
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(lr),
        )
        if self.mesh.shape.get("model", 1) == 1 and not self.fsdp:
            # one fused update over a single flattened vector instead of a
            # per-leaf op soup (~110 tiny f32[128]-class multiplies/step —
            # 2.6 ms/step at the tiny-SD op point, measured). Kept per-leaf
            # under model-axis TP (opt-state shardings follow param-path
            # rules) and under FSDP (the concatenated vector's length is
            # rarely divisible by the data axis; per-leaf moments shard
            # exactly like their params).
            tx = optax.flatten(tx)
        if accum > 1:
            # average the micro-grads; params (and clipping, which must see
            # the FULL-batch gradient) update once per window
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
        if self.fsdp:
            from ..parallel import fsdp_shardings

            self._state_shardings = fsdp_shardings(state, self.mesh)
            return jax.tree_util.tree_map(jax.device_put, state,
                                          self._state_shardings)
        return replicate(self.mesh, state)

    def num_params(self, state: TrainState) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))

    # ---------------- train ----------------
    def _build_train_step(self):
        cfg = self.cfg
        tables = self.tables
        model = self.model
        bs = cfg.batch_size

        latent_encode = self.latent_encode_fn

        def step_fn(state: TrainState, base, images, labels, rng):
            rng = jax.random.fold_in(rng, state.step)
            drop_key, loss_key, dropout_key, enc_key = jax.random.split(rng, 4)
            if latent_encode is not None:
                images = latent_encode(images, enc_key)
            labels = labels + 1  # 0 is reserved for unconditional
            drop = jax.random.uniform(drop_key, labels.shape) < cfg.train_rand
            labels = jnp.where(drop, 0, labels)

            def loss_fn(params):
                if self._state_shardings is not None:
                    # ZeRO: one explicit all-gather point; its transpose
                    # reduce-scatters the grads back to the params' layout
                    from ..parallel.fsdp import gather

                    params = gather(params, self.mesh)
                if self.lora_rank:
                    # adapters merge into the frozen base inside the jitted
                    # loss; autodiff routes grads to (A, B) only — base is
                    # a non-differentiated argument
                    from ..utils.lora import merge_lora

                    params = merge_lora(base, params, self.lora_scale)

                def apply(x, t, y):
                    return model.apply({"params": params}, x, t, y,
                                       deterministic=False,
                                       rngs={"dropout": dropout_key})
                l = ddpm_loss(apply, tables, images, labels, loss_key, cfg.T)
                return l.sum() / (bs * bs)

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
                # pin the updated state back to its ZeRO layout so it is
                # STORED reduce-scattered and donation reuses the buffers
                from ..parallel.fsdp import constrain

                state = constrain(state, self._state_shardings)
            return state, loss

        return jax.jit(step_fn, donate_argnums=(0,))

    def train_step(self, state, images, labels, rng):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        images, labels = shard_batch(self.mesh, (images, labels))
        return self._train_step(state, self._base_params, images, labels,
                                rng)

    def fit(self, loader: Iterable, state: Optional[TrainState] = None,
            epochs: Optional[int] = None, sample_every: int = 1,
            checkpoint_dir: Optional[str] = None):
        cfg = self.cfg
        steps_per_epoch = len(loader)
        if state is None:
            state = self.create_state(steps_per_epoch)
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
                for images, labels in prefetch_to_device(loader, self.mesh):
                    state, loss = self.train_step(state, images, labels, rng)
                    total += float(loss)
                    count += 1
                    if guard.should_stop:
                        break
                if guard.should_stop:
                    # preemption (SIGTERM): save a resumable checkpoint at
                    # the step boundary and exit cleanly
                    if ckpt:
                        ckpt.save(epoch, jax.device_get(state), force=True)
                    self.logger.log("preempted", epoch=epoch)
                    break
                epoch_loss = total / max(count, 1)
                dt = time.perf_counter() - t0
                self.logger.log(
                    "epoch", epoch=epoch, loss=epoch_loss,
                    sec=round(dt, 2),
                    imgs_per_sec=round(count * cfg.batch_size / dt, 1))
                if ckpt and epoch_loss < best_loss:
                    best_loss = epoch_loss
                    ckpt.save(epoch, jax.device_get(state))
        return state

    # ---------------- sample ----------------
    def sample(self, state: TrainState, labels, rng=None,
               use_ema: bool = False):
        """CFG ancestral sampling; labels are 1-based class ids (0=uncond)."""
        cfg = self.cfg
        if rng is None:
            rng = jax.random.key(cfg.seed + 2)
        labels = jnp.asarray(labels, jnp.int32)
        n = labels.shape[0]
        key = (n, use_ema)
        if key not in self._sample_fn:

            @jax.jit
            def sample_fn(params, base, labels, rng):
                if self.lora_rank:
                    from ..utils.lora import merge_lora

                    params = merge_lora(base, params, self.lora_scale)
                noise_key, samp_key = jax.random.split(rng)
                x_T = jax.random.normal(noise_key,
                                        (n,) + self.sample_shape)

                def apply(x, t, y):
                    return self.model.apply({"params": params}, x, t, y)

                out = ddpm_sample(apply, self.tables, x_T, labels, samp_key,
                                  cfg.T, w=cfg.w)
                if self.latent_decode_fn is not None:
                    out = jnp.clip(self.latent_decode_fn(out), -1.0, 1.0)
                return out

            self._sample_fn[key] = sample_fn
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        return self._sample_fn[key](params, self._base_params, labels, rng)
