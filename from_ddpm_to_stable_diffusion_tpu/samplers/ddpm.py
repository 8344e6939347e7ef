"""DDPM q-sample training loss and ancestral sampler with CFG.

TPU-native re-design of the reference TrainerDDPM / SamplerDDPM
(/root/reference/06_tiny_stable_diffusion/utils.py:96-171):

- Coefficient tables are host-precomputed float64→float32 constants
  (:mod:`..ops.schedules`), gathered per-step on device — no host math in
  the loop.
- The T-step reverse process is ONE ``lax.scan`` over a jitted body; the
  reference runs a 1000-iteration Python loop with two model forwards per
  step. Here the cond/uncond CFG pair is batched into a single forward
  (batch 2B) so the MXU sees one large matmul stream.
- Fresh per-step noise comes from ``jax.random.fold_in`` of the scan step —
  deterministic per seed, matching the reference's fresh-randn-per-step
  semantics distributionally.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.schedules import DDPMTables


def q_sample(tables: DDPMTables, x0, t, noise):
    """Forward diffusion x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε ."""
    sab = jnp.asarray(tables.sqrt_alphas_bar)[t]
    somab = jnp.asarray(tables.sqrt_one_minus_alphas_bar)[t]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return sab.reshape(shape) * x0 + somab.reshape(shape) * noise


def ddpm_loss(
    model_fn: Callable,
    tables: DDPMTables,
    x0: jax.Array,
    labels: jax.Array,
    rng: jax.Array,
    T: int,
) -> jax.Array:
    """Per-element MSE(ε̂, ε) with t ~ U[0, T), ε ~ N(0, I).

    Returns the unreduced loss (reference uses reduction='none' then
    ``.sum()/bs²`` — reduction is the caller's contract).
    """
    t_key, n_key = jax.random.split(rng)
    t = jax.random.randint(t_key, (x0.shape[0],), 0, T)
    noise = jax.random.normal(n_key, x0.shape, x0.dtype)
    x_t = q_sample(tables, x0, t, noise)
    pred = model_fn(x_t, t, labels)
    return (pred - noise) ** 2


def ddpm_sample(
    model_fn: Callable,
    tables: DDPMTables,
    x_T: jax.Array,
    labels: jax.Array,
    rng: jax.Array,
    T: int,
    w: float = 0.0,
    batched_cfg: bool = True,
) -> jax.Array:
    """Full T-step ancestral reverse process as one ``lax.scan``.

    ε̂ = (1+w)·ε(x,t,labels) − w·ε(x,t,0);  x_{t−1} = c1·x − c2·ε̂ + √var·z.
    Output clipped to [−1, 1].
    """
    coeff1 = jnp.asarray(tables.coeff1)
    coeff2 = jnp.asarray(tables.coeff2)
    var = jnp.asarray(tables.sampler_var)
    b = x_T.shape[0]
    shape = (-1,) + (1,) * (x_T.ndim - 1)

    def eps_cfg(x, t_vec):
        if batched_cfg:
            # one forward at batch 2B: [cond | uncond]
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t_vec, t_vec], axis=0)
            ll = jnp.concatenate([labels, jnp.zeros_like(labels)], axis=0)
            eps = model_fn(xx, tt, ll)
            cond, uncond = jnp.split(eps, 2, axis=0)
        else:
            cond = model_fn(x, t_vec, labels)
            uncond = model_fn(x, t_vec, jnp.zeros_like(labels))
        return (1.0 + w) * cond - w * uncond

    def body(x, step):
        t_scalar = T - 1 - step
        t_vec = jnp.full((b,), t_scalar, jnp.int32)
        eps = eps_cfg(x, t_vec)
        mean = (coeff1[t_scalar].reshape(shape) * x
                - coeff2[t_scalar].reshape(shape) * eps)
        noise = jax.random.normal(jax.random.fold_in(rng, step), x.shape,
                                  x.dtype)
        noise = jnp.where(t_scalar > 0, noise, jnp.zeros_like(noise))
        x = mean + jnp.sqrt(var[t_scalar]).reshape((1,) * x.ndim) * noise
        return x, None

    x0, _ = jax.lax.scan(body, x_T, jnp.arange(T))
    return jnp.clip(x0, -1.0, 1.0)
