"""Stable Diffusion 1 text→image / image→image pipeline.

TPU-native re-design of /root/reference/01_stable_diffusion-1/
stable_diffusion_pytorch/pipeline.py:11-207 — same public contract
(``generate(prompts, uncond_prompts, input_images, strength, do_cfg,
cfg_scale, height, width, sampler, n_inference_steps, seed)`` returning
uint8 images), entirely restructured for TPU:

- The 50-step denoise loop is ONE jitted ``lax.scan`` (k-LMS history ring,
  σ tables as constants) instead of a host Python loop with NumPy sampler
  math per step (reference pipeline.py:179-192, samplers/k_lms.py:38-55).
- CFG runs cond|uncond in a single batch-2B forward.
- Time embeddings for all steps are precomputed host-side as one (S, 320)
  table and indexed inside the scan — no per-step host→device transfer
  (reference re-uploads get_time_embedding(t) every step, pipeline.py:181).
- Models stay device-resident; no `.to(idle_device)` swapping
  (reference pipeline.py:96-99).
- bf16 compute / fp32 latents by default.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sd1 import CLIPText, SD1UNet, VAEDecoder, VAEEncoder
from ..ops import embeddings as emb_ops
from ..ops.image import rescale, to_uint8
from ..samplers.k_samplers import (KSamplerConfig, k_sampler_scan,
                                   make_sampler_body, sigma_tables)
from ..utils.dtypes import POLICIES

SAMPLERS = ("k_lms", "k_euler", "k_euler_ancestral", "dpmpp_2m")


def _store_params(params, compute_dtype):
    """Serving bundles store big weights in the compute dtype (identical
    numerics to the per-call cast; halves weight HBM reads — see
    utils.dtypes.cast_params_for_inference)."""
    if compute_dtype == jnp.bfloat16:
        from ..utils.dtypes import cast_params_for_inference

        return cast_params_for_inference(params, compute_dtype)
    return params


@dataclasses.dataclass
class SD1Models:
    """Device-resident model bundle (params trees + module defs)."""

    clip: CLIPText
    unet: SD1UNet
    encoder: VAEEncoder
    decoder: VAEDecoder
    params: Dict[str, Any]  # {"clip": .., "unet": .., "encoder": .., "decoder": ..}

    @classmethod
    def from_checkpoint_dir(cls, ckpt_dir: str,
                            dtype: str = "bf16") -> "SD1Models":
        """Load the reference's checkpoint layout: ``<dir>/ckpt/{clip,
        diffusion,encoder,decoder}.pt`` (01_.../model_loader.py:35-77)."""
        import os

        from ..io.weights import (import_sd1_clip, import_sd1_unet,
                                  import_sd1_vae_decoder,
                                  import_sd1_vae_encoder)

        dt = POLICIES[dtype].compute_dtype
        p = lambda name: os.path.join(ckpt_dir, "ckpt", f"{name}.pt")
        return cls(
            clip=CLIPText(dtype=dt), unet=SD1UNet(dtype=dt),
            encoder=VAEEncoder(dtype=dt), decoder=VAEDecoder(dtype=dt),
            params=_store_params({
                "clip": import_sd1_clip(p("clip")),
                "unet": import_sd1_unet(p("diffusion")),
                "encoder": import_sd1_vae_encoder(p("encoder")),
                "decoder": import_sd1_vae_decoder(p("decoder")),
            }, dt))

    @classmethod
    def initialize(cls, rng: jax.Array, dtype: str = "bf16",
                   height: int = 512, width: int = 512) -> "SD1Models":
        """Random-init bundle (for benchmarks/tests; real use imports weights)."""
        policy = POLICIES[dtype]
        dt = policy.compute_dtype
        clip = CLIPText(dtype=dt)
        unet = SD1UNet(dtype=dt)
        encoder = VAEEncoder(dtype=dt)
        decoder = VAEDecoder(dtype=dt)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        h8, w8 = height // 8, width // 8
        # jit each init: ONE compiled program per model instead of hundreds
        # of eager single-op dispatches (minutes-vs-seconds on the
        # remote-compile tunnel with a cold cache)
        params = {
            "clip": jax.jit(clip.init)(
                k1, jnp.zeros((1, 77), jnp.int32))["params"],
            "unet": jax.jit(unet.init)(
                k2, jnp.zeros((1, h8, w8, 4)), jnp.zeros((1, 77, 768)),
                jnp.zeros((1, 320)))["params"],
            "encoder": jax.jit(encoder.init)(
                k3, jnp.zeros((1, 64, 64, 3)),
                jnp.zeros((1, 8, 8, 4)))["params"],
            "decoder": jax.jit(decoder.init)(
                k4, jnp.zeros((1, 8, 8, 4)))["params"],
        }
        return cls(clip, unet, encoder, decoder, _store_params(params, dt))

    def quantize_int8(self) -> "SD1Models":
        """Switch the UNet's attention/GEGLU projections to the W8A8 int8
        serving path (ops/quantize.py). MEASURED SLOWER on SD1 at bs1 on a
        v5e: 25.1 vs 21.4 ms/step (tools/bench_sd1_int8.py) — the UNet's
        per-layer matmuls are small-K (320–1280) so the dynamic-quant VPU
        pass outweighs the MXU gain, unlike MMDiT/SD3 where int8 wins
        (docs/SD3_16GB.md). Kept for the HBM halving (420 MB) when UNet
        residency matters, and for larger-batch serving where the matmul
        share grows. Quantize BEFORE constructing an SD1Generator (its
        jitted step closes over the module def)."""
        from ..ops.quantize import quantize_tree

        self.unet = SD1UNet(model_channels=self.unet.model_channels,
                            context_dim=self.unet.context_dim,
                            num_heads=self.unet.num_heads,
                            dtype=self.unet.dtype, int8_mm=True)
        self.params["unet"] = jax.jit(quantize_tree, donate_argnums=0)(
            self.params["unet"])
        return self


def generate(
    prompts: Sequence[str],
    models: SD1Models,
    tokenizer=None,
    uncond_prompts: Optional[Sequence[str]] = None,
    input_images: Optional[Sequence[np.ndarray]] = None,
    strength: float = 0.8,
    do_cfg: bool = True,
    cfg_scale: float = 7.5,
    height: int = 512,
    width: int = 512,
    sampler: str = "k_lms",
    n_inference_steps: int = 50,
    seed: Optional[int] = None,
    return_latents: bool = False,
    loop: str = "scan",
    prompt_weighting: bool = False,
):
    """Text→image (or image→image when ``input_images`` given).

    Returns uint8 images (B, H, W, 3). Argument validation mirrors
    reference pipeline.py:74-91. ``loop="jit_step"`` drives the sampler
    from a host loop with a once-compiled step (see k_sampler_scan).

    This function retraces per call and bakes params into the program as
    constants — fine for tests and one-offs. The production/serving path
    is ``SD1Generator`` (compile-once, params as runtime arguments).
    """
    if not isinstance(prompts, (list, tuple)) or not prompts:
        raise ValueError("prompts must be a non-empty list or tuple")
    if uncond_prompts and not isinstance(uncond_prompts, (list, tuple)):
        raise ValueError("uncond_prompts must be a non-empty list or tuple "
                         "if provided")
    if uncond_prompts and len(prompts) != len(uncond_prompts):
        raise ValueError("length of uncond_prompts must be same as length "
                         "of prompts")
    if not 0.0 < strength <= 1.0:
        raise ValueError("strength must be between 0 and 1")
    if height % 8 or width % 8:
        raise ValueError("height and width must be multiples of 8")
    if sampler not in SAMPLERS:
        raise ValueError(f"unknown sampler value {sampler!r}")

    b = len(prompts)
    rng = jax.random.key(0 if seed is None else seed)
    tok_key, noise_key, enc_key, anc_key = jax.random.split(rng, 4)

    # ---- text conditioning (tokenize host-side; one CLIP forward) ----
    uncond_prompts = list(uncond_prompts or [""] * b)
    token_weights = None
    if tokenizer is None:
        tokens = np.zeros((2 * b if do_cfg else b, 77), np.int32)
    else:
        texts = list(prompts) + (uncond_prompts if do_cfg else [])
        if prompt_weighting:
            from ..io.prompt_weights import batch_encode_with_weights

            ids, token_weights = batch_encode_with_weights(tokenizer, texts)
            tokens = np.asarray(ids, np.int32)
        else:
            tokens = np.asarray(tokenizer.encode_batch(texts), np.int32)
    context = models.clip.apply({"params": models.params["clip"]},
                                jnp.asarray(tokens))
    if token_weights is not None:
        from ..io.prompt_weights import apply_token_weights

        context = apply_token_weights(context, np.asarray(token_weights,
                                                          np.float32))
    # context: (2B, 77, 768) = [cond | uncond] when do_cfg

    cfg = KSamplerConfig(
        method=sampler, n_inference_steps=n_inference_steps,
        strength=strength if input_images is not None else 1.0)
    tables = sigma_tables(cfg)
    h8, w8 = height // 8, width // 8

    # ---- latent init ----
    if input_images is not None:
        imgs = np.stack([np.asarray(im, np.float32) for im in input_images])
        imgs = rescale(jnp.asarray(imgs), (0, 255), (-1, 1))
        enc_noise = jax.random.normal(enc_key, (b, h8, w8, 4))
        latents = models.encoder.apply({"params": models.params["encoder"]},
                                       imgs, enc_noise)
        latents = latents + jax.random.normal(noise_key, latents.shape) \
            * tables["initial_scale"]
    else:
        latents = jax.random.normal(noise_key, (b, h8, w8, 4)) \
            * tables["initial_scale"]

    # ---- denoise scan (time features computed in-scan; 160 flops) ----
    def denoise_fn(x, timestep):
        t_feat = emb_ops.sd1_time_embedding(timestep[None])
        if do_cfg:
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.broadcast_to(t_feat, (2 * b, 320))
            out = models.unet.apply({"params": models.params["unet"]},
                                    xx, context, tt)
            cond, uncond = jnp.split(out, 2, axis=0)
            return uncond + cfg_scale * (cond - uncond)
        tt = jnp.broadcast_to(t_feat, (b, 320))
        return models.unet.apply({"params": models.params["unet"]},
                                 x, context, tt)

    latents = k_sampler_scan(denoise_fn, latents, cfg, rng=anc_key,
                             tables=tables, loop=loop)
    if return_latents:
        return latents

    # ---- decode ----
    images = models.decoder.apply({"params": models.params["decoder"]},
                                  latents)
    return np.asarray(to_uint8(images))


class SD1Generator:
    """Compile-once, call-many text→image pipeline.

    ``generate()`` retraces its stages every call (fine for one-offs and
    tests); production serving wants the CLIP encode, the denoise step, and
    the VAE decode compiled ONCE and reused across requests. This wrapper
    pins the op point (size, steps, sampler, CFG) at construction, jits the
    three stages, and drives the sampler either from a host loop with a
    donated carry (``loop="steps"``, per-step dispatch ≈0.1ms against a
    ~20ms step) or as ONE jitted ``lax.scan`` over the whole trajectory
    (``loop="trajectory"``).

    The trajectory mode is safe because params are runtime ARGUMENTS of
    the jitted program: ``tools/probe_traj_compile.py`` measured the
    860M-UNet 50-step scan compiling in ~31s that way, flat in step count
    — the historical ">45-min compile" pathology is specific to closing
    over the 1.7GB param tree as HLO constants (``generate()``'s shape),
    not to the scan itself.

    Same public contract as reference pipeline.py:11-207 generate(),
    restricted to txt2img.
    """

    def __init__(self, models: SD1Models, tokenizer=None,
                 sampler: str = "k_lms", n_inference_steps: int = 50,
                 do_cfg: bool = True, cfg_scale: float = 7.5,
                 height: int = 512, width: int = 512,
                 prompt_weighting: bool = False, mesh=None,
                 loop: str = "steps"):
        if loop not in ("steps", "trajectory"):
            raise ValueError(f"unknown loop value {loop!r}")
        self.loop = loop
        if sampler not in SAMPLERS:
            raise ValueError(f"unknown sampler value {sampler!r}")
        if height % 8 or width % 8:
            raise ValueError("height and width must be multiples of 8")
        if mesh is not None:
            # Tensor-parallel serving: shard attention/GEGLU kernels over
            # the mesh ``model`` axis (parallel.sharding rules); jit'd
            # stages see sharded params and GSPMD inserts the psums over
            # ICI. Latency mode — one image's denoise step spread across
            # chips.
            from ..parallel.sharding import apply_tp

            models.params = {k: apply_tp(v, mesh)
                             for k, v in models.params.items()}
        self.mesh = mesh
        self.models = models
        self.tokenizer = tokenizer
        self.prompt_weighting = prompt_weighting
        self.do_cfg = do_cfg
        self.cfg_scale = cfg_scale
        self.height, self.width = height, width
        self.cfg = KSamplerConfig(method=sampler,
                                  n_inference_steps=n_inference_steps)
        self.tables = sigma_tables(self.cfg)

        self._clip = jax.jit(lambda p, toks: models.clip.apply(
            {"params": p}, toks))
        self._decode = jax.jit(lambda p, z: to_uint8(
            models.decoder.apply({"params": p}, z)))
        self._encode = jax.jit(lambda p, x, n: models.encoder.apply(
            {"params": p}, x, n))
        # per-sample seeded initial latents (serving: each request in a
        # dynamically-formed batch keeps ITS seed's noise regardless of who
        # it was batched with) — one vmapped draw, jitted once
        h8, w8 = height // 8, width // 8
        self._seeded_latents = jax.jit(lambda seeds: jax.vmap(
            lambda s: jax.random.normal(jax.random.key(s),
                                        (h8, w8, 4)))(seeds))
        # the jitted sampler step is built lazily per (batch, start_step) —
        # the denoise body closes over the text context, which changes per
        # call, so context rides in the carry to keep ONE compiled
        # executable per key (img2img strengths change start_step, which
        # changes the baked LMS coefficient table)
        self._step_cache = {}

    def _denoise_fn(self, unet_params, x, timestep, context):
        b = x.shape[0]
        t_feat = emb_ops.sd1_time_embedding(timestep[None])
        if self.do_cfg:
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.broadcast_to(t_feat, (2 * b, 320))
            out = self.models.unet.apply({"params": unet_params}, xx,
                                         context, tt)
            cond, uncond = jnp.split(out, 2, axis=0)
            return uncond + self.cfg_scale * (cond - uncond)
        tt = jnp.broadcast_to(t_feat, (b, 320))
        return self.models.unet.apply({"params": unet_params}, x, context,
                                      tt)

    def _get_step(self, batch: int):
        """One jitted sampler step: (unet_params, carry) → carry, where
        carry = (sampler_state, context, rng, t).

        Params are an explicit argument — a closure capture would bake the
        1.7GB bf16 UNet into the executable as CONSTANTS (XLA duplicates
        them per program and compile time explodes). Context and rng ride
        in the (donated) carry so every prompt/seed reuses the SAME
        compiled executable — only batch size recompiles. The step index t
        is a device scalar IN the carry (incremented on device): the host
        loop issues pure async dispatches with no per-step host→device
        transfer, so wall-clock tracks device time.
        """
        return self._get_step_for(batch, self.cfg, self.tables)

    def _get_step_for(self, batch: int, cfg, tables):
        # INVARIANT: the jitted body closes over cfg + tables, so the key
        # must determine both.  Today it does: the generator's cfg is fixed
        # at construction and tables are fully derived from (cfg,
        # start_step).  If a per-call cfg field is ever added, fold it (or
        # a hash of the baked tables) into this key, or a stale executable
        # will silently alias.
        key = (batch, tables["start_step"])
        if key not in self._step_cache:
            def body(unet_params, carry):
                inner, ctx, k, t = carry
                sampler_body, _, _ = make_sampler_body(
                    lambda x, tt: self._denoise_fn(unet_params, x, tt, ctx),
                    cfg, rng=k, tables=tables)
                inner, _ = sampler_body(inner, t)
                return (inner, ctx, k, t + 1)

            self._step_cache[key] = jax.jit(body, donate_argnums=1)
        return self._step_cache[key]

    def _get_traj_for(self, batch: int, cfg, tables):
        """The whole denoise loop as ONE jitted scan:
        (unet_params, carry) → carry, same carry layout as ``_get_step_for``
        so the two loop modes share construction/extraction code. Params
        stay runtime arguments (constant-capture is the compile pathology —
        see class docstring); the carry is donated."""
        key = ("traj", batch, tables["start_step"])
        if key not in self._step_cache:
            n_scan = cfg.n_inference_steps - tables["start_step"]

            def traj(unet_params, carry):
                inner, ctx, k, t = carry
                sampler_body, _, _ = make_sampler_body(
                    lambda x, tt: self._denoise_fn(unet_params, x, tt, ctx),
                    cfg, rng=k, tables=tables)

                def body(c, _):
                    inner, t = c
                    inner, _ = sampler_body(inner, t)
                    return (inner, t + 1), None

                (inner, t), _ = jax.lax.scan(body, (inner, t), None,
                                             length=n_scan)
                return (inner, ctx, k, t)

            self._step_cache[key] = jax.jit(traj, donate_argnums=1)
        return self._step_cache[key]

    def __call__(self, prompts: Sequence[str],
                 uncond_prompts: Optional[Sequence[str]] = None,
                 seed: Optional[int] = None,
                 input_images: Optional[Sequence[np.ndarray]] = None,
                 strength: float = 0.8,
                 per_sample_seeds: Optional[Sequence[Optional[int]]] = None,
                 ) -> np.ndarray:
        """txt2img, or img2img when ``input_images`` (uint8 HWC arrays at
        the pipeline size) are given: latents start from the VAE-encoded
        image noised to σ[start_step] and the SAME compiled step runs the
        remaining steps (the step index lives in the carry, so partial
        trajectories reuse the txt2img executable).

        ``per_sample_seeds`` (txt2img only) draws each sample's initial
        latents from its OWN key, so a request batched by the serving layer
        reproduces identically at any batch size with the deterministic
        samplers (k_lms / k_euler / dpmpp_2m); ``None`` entries derive from
        ``seed`` and position. Ancestral samplers additionally mix a
        batch-level key per step, so they are only batch-reproducible."""
        b = len(prompts)
        if per_sample_seeds is not None and input_images is not None:
            raise ValueError("per_sample_seeds is txt2img-only")
        rng = jax.random.key(0 if seed is None else seed)
        _, noise_key, enc_key, anc_key = jax.random.split(rng, 4)
        uncond_prompts = list(uncond_prompts or [""] * b)
        token_weights = None
        if self.tokenizer is None:
            tokens = np.zeros((2 * b if self.do_cfg else b, 77), np.int32)
        else:
            texts = list(prompts) + (uncond_prompts if self.do_cfg else [])
            if self.prompt_weighting:
                from ..io.prompt_weights import batch_encode_with_weights

                ids, token_weights = batch_encode_with_weights(
                    self.tokenizer, texts)
                tokens = np.asarray(ids, np.int32)
            else:
                tokens = np.asarray(self.tokenizer.encode_batch(texts),
                                    np.int32)
        context = self._clip(self.models.params["clip"],
                             jnp.asarray(tokens))
        if token_weights is not None:
            from ..io.prompt_weights import apply_token_weights

            context = apply_token_weights(
                context, np.asarray(token_weights, np.float32))

        h8, w8 = self.height // 8, self.width // 8
        if input_images is not None:
            if not 0.0 < strength <= 1.0:
                raise ValueError("strength must be between 0 and 1")
            cfg = dataclasses.replace(self.cfg, strength=strength)
            tables = sigma_tables(cfg)
            imgs = np.stack([np.asarray(im, np.float32)
                             for im in input_images])
            imgs = rescale(jnp.asarray(imgs), (0, 255), (-1, 1))
            enc_noise = jax.random.normal(enc_key, (b, h8, w8, 4))
            latents = self._encode(self.models.params["encoder"], imgs,
                                   enc_noise)
            latents = latents + jax.random.normal(noise_key, latents.shape) \
                * tables["initial_scale"]
        elif per_sample_seeds is not None:
            if len(per_sample_seeds) != b:
                raise ValueError("per_sample_seeds must match len(prompts)")
            cfg, tables = self.cfg, self.tables
            base = 0 if seed is None else seed
            filled = np.asarray(
                [(s if s is not None else base * 100003 + 17 * i + 1)
                 & 0xFFFFFFFF for i, s in enumerate(per_sample_seeds)],
                np.uint32)
            latents = self._seeded_latents(jnp.asarray(filled)) \
                * tables["initial_scale"]
        else:
            cfg, tables = self.cfg, self.tables
            latents = jax.random.normal(noise_key, (b, h8, w8, 4)) \
                * tables["initial_scale"]
        _, make_carry, extract = make_sampler_body(
            lambda x, t: x, cfg, rng=anc_key, tables=tables)
        carry = (make_carry(latents), context, anc_key,
                 jnp.int32(tables["start_step"]))
        unet_params = self.models.params["unet"]
        if self.loop == "trajectory":
            carry = self._get_traj_for(b, cfg, tables)(unet_params, carry)
        else:
            step = self._get_step_for(b, cfg, tables)
            for _ in range(tables["start_step"], cfg.n_inference_steps):
                carry = step(unet_params, carry)
        return np.asarray(self._decode(self.models.params["decoder"],
                                       extract(carry[0])))
