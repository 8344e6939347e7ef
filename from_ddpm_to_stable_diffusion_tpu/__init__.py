"""TPU-native generative-vision framework.

A from-scratch JAX / XLA / Pallas re-design of the capability set of
JAYANDJEAN/From_DDPM_to_Stable_Diffusion (a PyTorch pedagogical ladder from
tiny DDPMs up to Stable Diffusion 3): trainable DDPM / VAE / VQ-VAE / ViT /
CLIP, and full SD1 + SD3 inference pipelines — built TPU-first:

* compute path: ``jax.jit`` + ``lax.scan`` sampler loops, Pallas flash
  attention and fused GroupNorm kernels, bf16-on-MXU dtype policy, NHWC;
* scale path: ``jax.sharding.Mesh`` + NamedSharding (DP/TP/SP) with XLA
  collectives over ICI (see :mod:`.parallel`);
* runtime: threaded native data pipeline, Orbax checkpoints, structured
  metrics (see :mod:`.io`, :mod:`.utils`).

Subpackages
-----------
- ``ops``        — pure functional primitives: noise/σ schedules, time
                   embeddings, attention, group norm, conv/pad helpers.
- ``models``     — Flax model zoo: tiny UNet, VAEs, SD1 (CLIP/UNet/VAE),
                   SD3 (MMDiT/T5/CLIP-G/16-ch VAE), ViT, CLIP, SigLIP.
- ``samplers``   — k-diffusion (LMS/Euler/Euler-ancestral), DDPM ancestral,
                   rectified-flow Euler; all as ``lax.scan`` step functions.
- ``pipelines``  — end-user entry points: SD1 ``generate()``, SD3 inferencer,
                   trainers (DDPM, VAE/VQ-VAE, ViT, CLIP).
- ``parallel``   — device mesh builder, sharding specs, ring attention.
- ``io``         — BPE tokenizer, weight import (.pt / .safetensors),
                   image-folder data pipeline.
- ``utils``      — configs, logging, profiling, checkpointing, RNG helpers.
"""

__version__ = "0.1.0"
