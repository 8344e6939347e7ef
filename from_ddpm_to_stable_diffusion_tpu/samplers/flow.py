"""Rectified-flow (discrete-flow) Euler sampler for SD3-class models.

TPU-native re-design of the reference sample_euler + ModelSamplingDiscreteFlow
(/root/reference/02_stable_diffusion-3/utils.py:26-49, sd3_infer.py:47-79):
σ(t) = shift·t/(1+(shift−1)·t); denoised = x − model_out·σ;
d = (x − denoised)/σ; x ← x + d·dt — as one ``lax.scan``.

The reference keeps every intermediate latent (utils.py:48-49) and decodes
all 50 of them; here that is an option (``keep_trajectory``) so the default
path stays device-resident and O(1) in memory.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import schedules


def noise_scaling(sigma, noise, latent):
    """Flow-matching forward blend: σ·noise + (1−σ)·latent."""
    return sigma * noise + (1.0 - sigma) * latent


def flow_euler_sample(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    latents: jax.Array,
    steps: int = 50,
    shift: float = 3.0,
    num_timesteps: int = 1000,
    keep_trajectory: bool = False,
    sigmas: Optional[np.ndarray] = None,
):
    """Euler-integrate the probability-flow ODE.

    ``denoise_fn(x, sigma)`` returns the *denoised* prediction (the model
    wrapper applies timestep(σ)=σ·1000 and x − out·σ internally, mirroring
    BaseModel.apply_model, sd3_infer.py:108-113).
    """
    if sigmas is None:
        sigmas = schedules.sd3_sigma_schedule(steps, shift, num_timesteps)
    sig = jnp.asarray(sigmas, jnp.float32)

    def body(x, i):
        sigma = sig[i]
        denoised = denoise_fn(x, sigma)
        d = (x - denoised) / jnp.maximum(sigma, 1e-12)
        x = x + d * (sig[i + 1] - sigma)
        return x, (x if keep_trajectory else None)

    x, traj = jax.lax.scan(body, latents, jnp.arange(steps))
    return (x, traj) if keep_trajectory else x


def flow_heun_sample(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    latents: jax.Array,
    steps: int = 25,
    shift: float = 3.0,
    num_timesteps: int = 1000,
    keep_trajectory: bool = False,
    sigmas: Optional[np.ndarray] = None,
):
    """Heun (2nd-order) integration of the same probability-flow ODE.

    Beyond the reference (which ships Euler only, utils.py:26-49): the
    trapezoid corrector halves the step count at equal ODE accuracy —
    O(h²) local truncation vs Euler's O(h) — at 2 model calls per step
    except the final step (σ_next = 0 is a plain Euler step, matching
    k-diffusion's convention; the corrector would evaluate at σ = 0 where
    a flow model's velocity prediction is undefined/untrained). Serving
    math: N Heun steps ≈ 2N−1 model calls for the accuracy of ~4N Euler
    steps (tests/test_samplers.py pins the convergence ordering).
    """
    if sigmas is None:
        sigmas = schedules.sd3_sigma_schedule(steps, shift, num_timesteps)
    sig = jnp.asarray(sigmas, jnp.float32)

    def body(x, i):
        sigma = sig[i]
        sigma_next = sig[i + 1]
        h = sigma_next - sigma
        denoised = denoise_fn(x, sigma)
        d = (x - denoised) / jnp.maximum(sigma, 1e-12)
        x_euler = x + d * h

        def corrected(_):
            denoised2 = denoise_fn(x_euler, sigma_next)
            d2 = (x_euler - denoised2) / jnp.maximum(sigma_next, 1e-12)
            return x + 0.5 * (d + d2) * h

        x = jax.lax.cond(sigma_next > 0, corrected, lambda _: x_euler,
                         None)
        return x, (x if keep_trajectory else None)

    x, traj = jax.lax.scan(body, latents, jnp.arange(steps))
    return (x, traj) if keep_trajectory else x
