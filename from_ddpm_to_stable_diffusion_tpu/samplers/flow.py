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
