"""Noise / sigma schedules as pure functions.

All table builders run on host in float64 NumPy at setup time and are closed
over by jitted step functions as compile-time constants — the TPU-idiomatic
replacement for the reference's per-step host-side NumPy sampler math
(reference: 01_stable_diffusion-1/stable_diffusion_pytorch/samplers/k_lms.py:38-55,
which re-integrates Lagrange polynomials on host inside the hot loop).

Behavioral parity targets (file:line into /root/reference):
- ``get_alphas_cumprod``: 01_.../stable_diffusion_pytorch/util.py:12-16
- ``karras_sigma_schedule``: 01_.../samplers/k_lms.py:7-16 (shared by all three
  k-samplers)
- ``lms_coefficients``: 01_.../samplers/k_lms.py:44-53 (trapezoid-integrated
  81-point Lagrange polynomial), precomputed for the whole trajectory here.
- ``ddpm_tables``: 06_tiny_stable_diffusion/utils.py:96-141
- ``flow_sigma`` / ``sd3_sigma_schedule``: 02_stable_diffusion-3/sd3_infer.py:47-79,263-272
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def get_alphas_cumprod(
    beta_start: float = 0.00085,
    beta_end: float = 0.0120,
    n_training_steps: int = 1000,
) -> np.ndarray:
    """SD1 scaled-linear ᾱ table: β from sqrt-linspace(√β₀, √β₁)², ᾱ=∏(1−β)."""
    betas = (
        np.linspace(
            beta_start**0.5, beta_end**0.5, n_training_steps, dtype=np.float32
        )
        ** 2
    )
    alphas = 1.0 - betas
    return np.cumprod(alphas, axis=0)


def karras_sigma_schedule(
    n_inference_steps: int = 50,
    n_training_steps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.0120,
) -> tuple[np.ndarray, np.ndarray]:
    """k-diffusion σ trajectory used by all three SD1 samplers.

    σ_full = √((1−ᾱ)/ᾱ); log-interp onto linspace(T−1, 0, steps); append 0.

    Returns:
      sigmas:    (steps+1,) float64, descending, last entry exactly 0.
      timesteps: (steps,) float64, linspace(T−1, 0, steps).
    """
    timesteps = np.linspace(n_training_steps - 1, 0, n_inference_steps)
    alphas_cumprod = get_alphas_cumprod(beta_start, beta_end, n_training_steps)
    sigmas = ((1.0 - alphas_cumprod) / alphas_cumprod) ** 0.5
    log_sigmas = np.interp(timesteps, np.arange(n_training_steps), np.log(sigmas))
    sigmas = np.exp(log_sigmas)
    sigmas = np.append(sigmas, 0.0)
    return sigmas, timesteps


def input_scale(sigmas: np.ndarray) -> np.ndarray:
    """Per-step latent pre-scale 1/√(σ²+1) (k-sampler ``get_input_scale``)."""
    return 1.0 / np.sqrt(sigmas**2 + 1.0)


def lms_coefficients(
    sigmas: np.ndarray,
    order: int = 4,
    start_step: int = 0,
    n_quad_points: int = 81,
) -> np.ndarray:
    """Full (steps, order) linear-multistep coefficient table.

    Entry [t, i] integrates the Lagrange basis polynomial through the last
    ``m = min(t - start_step + 1, order)`` sigma points from σ_t to σ_{t+1}
    via an ``n_quad_points``-point trapezoid rule — numerically identical to
    the reference's per-step computation but hoisted out of the sampling loop
    so the jitted ``lax.scan`` body is a single (order,)-dot with the history
    ring buffer. Entries for i >= m are 0 (history not yet filled).
    """
    n_steps = len(sigmas) - 1
    table = np.zeros((n_steps, order), dtype=np.float64)
    for t in range(start_step, n_steps):
        m = min(t - start_step + 1, order)
        x = np.linspace(sigmas[t], sigmas[t + 1], n_quad_points)
        for i in range(m):
            y = np.ones(n_quad_points)
            for j in range(m):
                if i == j:
                    continue
                y *= (x - sigmas[t - j]) / (sigmas[t - i] - sigmas[t - j])
            table[t, i] = np.trapezoid(y=y, x=x)
    return table


@dataclasses.dataclass(frozen=True)
class DDPMTables:
    """Precomputed DDPM q-sample / ancestral-sampling coefficient tables.

    Matches the buffers of the reference trainer/sampler
    (06_tiny_stable_diffusion/utils.py:96-141): β linear in [β₁, β_T], all
    derived quantities computed in float64 then cast to float32 for device use.
    """

    betas: np.ndarray                    # (T,)
    sqrt_alphas_bar: np.ndarray          # (T,) √ᾱ — q-sample signal coeff
    sqrt_one_minus_alphas_bar: np.ndarray  # (T,) √(1−ᾱ) — q-sample noise coeff
    coeff1: np.ndarray                   # (T,) √(1/α)
    coeff2: np.ndarray                   # (T,) coeff1·(1−α)/√(1−ᾱ)
    posterior_var: np.ndarray            # (T,) β·(1−ᾱ_{t−1})/(1−ᾱ)
    sampler_var: np.ndarray              # (T,) cat([posterior_var[1:2], betas[1:]])


def ddpm_tables(beta_1: float, beta_T: float, T: int) -> DDPMTables:
    betas = np.linspace(beta_1, beta_T, T, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])
    coeff1 = np.sqrt(1.0 / alphas)
    coeff2 = coeff1 * (1.0 - alphas) / np.sqrt(1.0 - alphas_bar)
    posterior_var = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
    sampler_var = np.concatenate([posterior_var[1:2], betas[1:]])
    f32 = lambda a: a.astype(np.float32)
    return DDPMTables(
        betas=f32(betas),
        sqrt_alphas_bar=f32(np.sqrt(alphas_bar)),
        sqrt_one_minus_alphas_bar=f32(np.sqrt(1.0 - alphas_bar)),
        coeff1=f32(coeff1),
        coeff2=f32(coeff2),
        posterior_var=f32(posterior_var),
        sampler_var=f32(sampler_var),
    )


def flow_sigma(timestep, shift: float = 1.0, num_timesteps: int = 1000):
    """SD3 discrete-flow σ(t) = shift·(t/1000) / (1 + (shift−1)·(t/1000)).

    Works on NumPy arrays and JAX tracers alike (pure arithmetic).
    """
    t = timestep / float(num_timesteps)
    if shift == 1.0:
        return t
    return shift * t / (1.0 + (shift - 1.0) * t)


def flow_timestep(sigma, num_timesteps: int = 1000):
    """Inverse map fed to MMDiT: timestep(σ) = σ·1000."""
    return sigma * float(num_timesteps)


def sd3_sigma_schedule(
    steps: int = 50, shift: float = 3.0, num_timesteps: int = 1000
) -> np.ndarray:
    """(steps+1,) σ trajectory: σ(linspace(t_max, t_min, steps)) then 0.

    σ table indexed 1..1000 so σ_min=σ(1), σ_max=σ(1000).
    """
    ts = flow_sigma(np.arange(1, num_timesteps + 1, dtype=np.float64), shift,
                    num_timesteps)
    start = flow_timestep(ts[-1], num_timesteps)
    end = flow_timestep(ts[0], num_timesteps)
    timesteps = np.linspace(start, end, steps)
    sigs = flow_sigma(timesteps, shift, num_timesteps)
    return np.append(sigs, 0.0)


def cosine_warmup_lr(
    base_lr: float,
    max_lr: float,
    warmup_epochs: int,
    total_epochs: int,
    steps_per_epoch: int = 1,
    min_lr: Optional[float] = None,
):
    """Per-step LR schedule: linear warmup base→max then cosine anneal to 0.

    Epoch-granular to match the reference CosineWarmupScheduler
    (06_tiny_stable_diffusion/utils.py:75-93) which steps once per epoch.
    Returns an optax-compatible ``schedule(count) -> lr`` callable.
    """
    import jax.numpy as jnp

    if min_lr is None:
        min_lr = 0.0
    cosine_epochs = max(total_epochs - warmup_epochs, 1)

    def schedule(count):
        epoch = count // steps_per_epoch
        warm = base_lr + (max_lr - base_lr) * epoch / max(warmup_epochs, 1)
        progress = jnp.clip((epoch - warmup_epochs) / cosine_epochs, 0.0, 1.0)
        cos = min_lr + 0.5 * (max_lr - min_lr) * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule
