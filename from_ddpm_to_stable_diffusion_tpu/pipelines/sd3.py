"""Stable Diffusion 3 inference pipeline.

TPU-native re-design of /root/reference/02_stable_diffusion-3/sd3_infer.py:
- ``sniff_mmdit_config``: infers MMDiT hyperparameters from checkpoint
  tensor shapes exactly like BaseModel.__init__ (sd3_infer.py:85-105) —
  patch_size from x_embedder kernel, depth = hidden//64, pos_embed_max_size
  = √(pos_embed tokens), adm_in_channels from y_embedder.
- ``CFGDenoiser``: cond|uncond batched in one forward, then
  ``neg + (pos − neg)·scale`` (sd3_infer.py:122-137).
- ``SD3Inferencer``: empty latent = ones·0.0609, σ schedule with shift,
  noise-scaling σ·n + (1−σ)·x (max-denoise aware), rectified-flow Euler
  scan, latent-format shift/scale, VAE decode (sd3_infer.py:240-405).

The reference's per-phase `.cuda()/.cpu()` offload choreography
(sd3_infer.py:324-375) becomes phase-scoped params: with
``offload_text_encoders=True`` the text-encoder param groups are dropped
(their HBM buffers freed) once conditioning is computed — on a 16GB v5e the
bf16 MMDiT-medium + VAE stay resident through denoise/decode while T5-XXL's
~9.4GB is reclaimed. ``SD3Models.free`` is the primitive;
``SD3Models.hbm_bytes_live`` reports the device high-water evidence.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mmdit import (BOUNDED_LOGIT_BUDGET, MMDiT,
                            MMDiTConfig, qk_norm_logit_bound)
from ..models.sd3_vae import SD3LatentFormat, SD3VAEDecoder, SD3VAEEncoder
from ..models.text_encoders import (CLIP_G_CONFIG, CLIP_L_CONFIG,
                                    CLIPTextModel, T5Config, T5Encoder,
                                    assemble_sd3_cond)
from ..ops.image import to_uint8
from ..samplers.flow import (flow_euler_sample, flow_heun_sample,
                             noise_scaling)
from ..utils.dtypes import POLICIES


def _store_params(params, compute_dtype):
    """Serving bundles store big weights in the compute dtype — identical
    numerics to the per-call cast, half the per-step HBM weight reads (and
    half the checkpoint-resident footprint, which is what lets T5-XXL +
    MMDiT phase-share one 16GB chip). See utils.dtypes.cast_params_for_inference."""
    import jax.numpy as _jnp

    if compute_dtype == _jnp.bfloat16:
        from ..utils.dtypes import cast_params_for_inference

        return cast_params_for_inference(params, compute_dtype)
    return params


def sniff_mmdit_config(state: Dict[str, np.ndarray],
                       prefix: str = "model.diffusion_model.") -> MMDiTConfig:
    """Infer MMDiTConfig from a safetensors state dict's tensor shapes."""
    patch_kernel = state[f"{prefix}x_embedder.proj.weight"]
    patch_size = patch_kernel.shape[2]
    in_channels = patch_kernel.shape[1]
    hidden = patch_kernel.shape[0]
    depth = hidden // 64
    pos = state.get(f"{prefix}pos_embed")
    pos_embed_max_size = (int(math.sqrt(pos.shape[1]))
                          if pos is not None else 192)
    y_key = f"{prefix}y_embedder.mlp.0.weight"
    adm = state[y_key].shape[1] if y_key in state else None
    ctx_key = f"{prefix}context_embedder.weight"
    context_dim = state[ctx_key].shape[1] if ctx_key in state else None
    qk_norm = ("rms" if f"{prefix}joint_blocks.0.x_block.attn.ln_q.weight"
               in state else None)
    return MMDiTConfig(patch_size=patch_size, in_channels=in_channels,
                       depth=depth, adm_in_channels=adm,
                       context_dim=context_dim,
                       pos_embed_max_size=pos_embed_max_size,
                       qk_norm=qk_norm)


@dataclasses.dataclass
class SD3Models:
    """Module defs + params for the five SD3 model groups."""

    mmdit: MMDiT
    vae_encoder: SD3VAEEncoder
    vae_decoder: SD3VAEDecoder
    clip_l: CLIPTextModel
    clip_g: CLIPTextModel
    t5: Optional[T5Encoder]
    params: Dict[str, Any]

    @classmethod
    def from_checkpoints(cls, sd3_path: str,
                         clip_l_path: Optional[str] = None,
                         clip_g_path: Optional[str] = None,
                         t5_path: Optional[str] = None,
                         dtype: str = "bf16") -> "SD3Models":
        """Load the reference's five model groups from safetensors files
        (sd3_infer.py load(); MMDiT config shape-sniffed from the ckpt)."""
        from ..io.weights_sd3 import (import_clip_text, import_sd3_checkpoint,
                                      import_t5)

        dt = POLICIES[dtype].compute_dtype
        mmdit_params, enc_params, dec_params, cfg = import_sd3_checkpoint(
            sd3_path)
        params = {"mmdit": mmdit_params, "vae_encoder": enc_params,
                  "vae_decoder": dec_params}
        if cfg.qk_norm:
            # certify the bounded-softmax fast path against the LOADED
            # gains; unusually large checkpoints degrade gracefully to
            # the online softmax instead of overflowing exp (ADVICE r4)
            bound = qk_norm_logit_bound(mmdit_params, 64, cfg.qk_norm)
            if bound >= BOUNDED_LOGIT_BUDGET:
                print(f"[sd3] qk-norm logit bound {bound:.1f} >= "
                      f"{BOUNDED_LOGIT_BUDGET:.0f}: online softmax")
                cfg = dataclasses.replace(cfg, stability="online")
        mmdit = MMDiT(cfg, dtype=dt)
        clip_l = CLIPTextModel(CLIP_L_CONFIG, intermediate_output=-2,
                               dtype=dt)
        clip_g = CLIPTextModel(CLIP_G_CONFIG, intermediate_output=-2,
                               dtype=dt)
        t5 = None
        if clip_l_path:
            params["clip_l"] = import_clip_text(
                clip_l_path, CLIP_L_CONFIG.num_layers)
        if clip_g_path:
            params["clip_g"] = import_clip_text(
                clip_g_path, CLIP_G_CONFIG.num_layers)
        if t5_path:
            t5 = T5Encoder(T5Config(), dtype=dt)
            params["t5"] = import_t5(t5_path)
        return cls(mmdit, SD3VAEEncoder(dtype=dt), SD3VAEDecoder(dtype=dt),
                   clip_l, clip_g, t5, _store_params(params, dt))

    @classmethod
    def initialize(cls, rng: jax.Array, dtype: str = "bf16",
                   depth: int = 4, with_t5: bool = True,
                   t5_config: Optional[T5Config] = None,
                   pos_embed_max_size: int = 96,
                   clip_l_cfg=CLIP_L_CONFIG, clip_g_cfg=CLIP_G_CONFIG,
                   int8: bool = False) -> "SD3Models":
        """Random-init bundle (tests/bench); real use imports safetensors.

        ``depth=24`` with the real text-encoder configs reproduces
        SD3-medium; the default is a scaled-down stand-in.

        ``int8``: build the all-resident W8A8 serving bundle directly —
        each of mmdit/t5 runs init + dtype cast + quantize_tree as ONE
        jitted program, so the full-precision init values are per-buffer
        intermediates XLA frees as it goes. A full-scale SD3-medium bundle
        (T5-XXL incl.) then never peaks near the bf16 15.6 GiB sum —
        required to stand the stack up from random weights on one 16 GB
        chip (quantize_int8() after the fact would pay that peak).
        """
        dt = POLICIES[dtype].compute_dtype
        cfg = MMDiTConfig(depth=depth, pos_embed_max_size=pos_embed_max_size,
                          int8_mm=int8)
        mmdit = MMDiT(cfg, dtype=dt)
        vae_e = SD3VAEEncoder(dtype=dt)
        vae_d = SD3VAEDecoder(dtype=dt)
        clip_l = CLIPTextModel(clip_l_cfg, intermediate_output=-2,
                               dtype=dt)
        clip_g = CLIPTextModel(clip_g_cfg, intermediate_output=-2,
                               dtype=dt)
        t5cfg = t5_config or T5Config()
        if int8:
            t5cfg = dataclasses.replace(t5cfg, int8_mm=True)
        t5 = T5Encoder(t5cfg, dtype=dt) if with_t5 else None
        ks = jax.random.split(rng, 6)

        # jit each init: ONE compiled program per model instead of hundreds
        # of eager single-op dispatches (minutes-vs-seconds on the
        # remote-compile tunnel with a cold cache). init always runs on the
        # bf16 module variant; quantization happens inside the same program.
        def _init_group(model, key, *args, quant=False):
            def g(k):
                p = model.init(k, *args)["params"]
                p = _store_params(p, dt)
                if quant:
                    from ..ops.quantize import quantize_tree

                    p = quantize_tree(p)
                return p

            return jax.jit(g)(key)

        mmdit_init = (MMDiT(dataclasses.replace(cfg, int8_mm=False),
                            dtype=dt) if int8 else mmdit)
        t5_init = (T5Encoder(dataclasses.replace(t5cfg, int8_mm=False),
                             dtype=dt) if (int8 and with_t5) else t5)
        params = {
            "mmdit": _init_group(
                mmdit_init, ks[0], jnp.zeros((1, 16, 16, 16)),
                jnp.zeros((1,)), jnp.zeros((1, 2048)),
                jnp.zeros((1, 154, 4096)), quant=int8),
            "vae_encoder": _init_group(vae_e, ks[1],
                                       jnp.zeros((1, 32, 32, 3))),
            "vae_decoder": _init_group(vae_d, ks[2],
                                       jnp.zeros((1, 4, 4, 16))),
            "clip_l": _init_group(clip_l, ks[3],
                                  jnp.zeros((1, 77), jnp.int32)),
            "clip_g": _init_group(clip_g, ks[4],
                                  jnp.zeros((1, 77), jnp.int32)),
        }
        if with_t5:
            params["t5"] = _init_group(t5_init, ks[5],
                                       jnp.zeros((1, 77), jnp.int32),
                                       quant=int8)
        return cls(mmdit, vae_e, vae_d, clip_l, clip_g, t5, params)

    def quantize_int8(self, groups=("mmdit", "t5")) -> "SD3Models":
        """Switch groups to the W8A8 int8 serving path (ops/quantize.py).

        Rebuilds the module defs with ``int8_mm=True`` and converts the
        matching projection kernels to {int8 q, fp32 scale} in place.
        MMDiT int8 measures 1.12x the bf16 step on a v5e
        (tools/bench_sd3_int8.py); the T5/MMDiT HBM halving is what makes
        the ALL-RESIDENT SD3-medium serving mode fit one 16 GB chip
        (T5-XXL 9.5→4.8 GiB — docs/SD3_16GB.md), removing the per-prompt
        phase offload entirely. CLIPs/VAE stay bf16 (small).
        """
        from ..ops.quantize import quantize_tree

        for g in groups:
            if g not in self.params:
                continue
            if g == "mmdit":
                cfg = dataclasses.replace(self.mmdit.config, int8_mm=True)
                self.mmdit = MMDiT(cfg, dtype=self.mmdit.dtype,
                                   mesh=self.mmdit.mesh,
                                   seq_axis=self.mmdit.seq_axis)
            elif g == "t5":
                if self.t5 is None:
                    continue
                cfg = dataclasses.replace(self.t5.config, int8_mm=True)
                self.t5 = T5Encoder(cfg, dtype=self.t5.dtype)
            else:
                raise ValueError(f"int8 not supported for group '{g}'")
            self.params[g] = jax.jit(quantize_tree,
                                     donate_argnums=0)(self.params[g])
        return self

    def free(self, *names: str) -> None:
        """Drop param groups and delete their device buffers — the TPU
        equivalent of the reference's ``model.cpu()`` phase offload
        (sd3_infer.py:324-375). Dropping the last reference releases the
        HBM allocation immediately (no GC cycle on jax.Array buffers)."""
        for name in names:
            group = self.params.pop(name, None)
            if group is not None:
                for leaf in jax.tree_util.tree_leaves(group):
                    if isinstance(leaf, jax.Array):
                        leaf.delete()

    def free_text_encoders(self) -> None:
        self.free("clip_l", "clip_g", "t5")

    @staticmethod
    def hbm_bytes_live() -> Optional[int]:
        """Device bytes currently allocated (None if the backend does not
        expose memory_stats, e.g. CPU)."""
        stats = jax.local_devices()[0].memory_stats()
        return None if stats is None else stats.get("bytes_in_use")


class SD3Inferencer:
    """gen_image: prompt strings (with a tokenizer) or token ids → uint8
    images, mirroring the reference's prompt-in image-out surface
    (sd3_infer.py:383-405)."""

    def __init__(self, models: SD3Models, shift: float = 3.0,
                 tokenizer=None, mesh=None, decode_mode: str = "auto"):
        """``tokenizer``: an ``io.spm_tokenizer.SD3Tokenizer`` (CLIP + T5
        trio). Required for the text-prompt entry points only.

        ``mesh``: tensor-parallel serving — MMDiT/CLIP/T5 attention and
        MLP kernels shard over the mesh ``model`` axis
        (parallel.sharding rules); GSPMD inserts the psums over ICI.

        ``decode_mode``: ``"whole"`` decodes per image through one jitted
        whole-image program; ``"tiled"`` uses the streamed row-strip
        decoder (models/sd3_vae_tiled.py — bounded live set, whole batch
        at once); ``"auto"`` picks tiled for batch > 1 at ≥ 1024² where
        the whole-image ladder would exhaust HBM next to all-resident
        params (docs/SERVING_CURVE.md).
        """
        if decode_mode not in ("auto", "whole", "tiled"):
            raise ValueError(f"unknown decode_mode {decode_mode!r}")
        self.decode_mode = decode_mode
        if mesh is not None:
            from ..parallel.sharding import apply_tp

            models.params = {k: (apply_tp(v, mesh) if v is not None else v)
                             for k, v in models.params.items()}
        self.mesh = mesh
        self.models = models
        self.shift = shift
        self.tokenizer = tokenizer
        # shape-keyed executable caches (compile-once serving, like
        # SD1Generator): text encode / denoise scan / VAE decode each jit
        # once per shape class and take params as ARGUMENTS (so --int8 /
        # TP param swaps made before first use flow through). Without
        # these, every apply ran eagerly (one relay dispatch per op) and
        # the 50-step scan retraced per request.
        self._enc_cache = {}
        self._denoise_cache = {}
        self._decode_cache = {}

    def get_empty_latent(self, width: int, height: int) -> jax.Array:
        return jnp.ones((1, height // 8, width // 8, 16)) * 0.0609

    # -- tokenization ------------------------------------------------------
    def tokenize(self, text: str):
        """(clip_l_ids, clip_g_ids, t5_ids) each (1, 77) int32."""
        if self.tokenizer is None:
            raise ValueError(
                "text prompts need a tokenizer: pass io.spm_tokenizer."
                "SD3Tokenizer(clip_tok, t5_tok) to SD3Inferencer")
        streams = self.tokenizer.encode(text)
        return (np.asarray([streams["l"]], np.int32),
                np.asarray([streams["g"]], np.int32),
                np.asarray([streams["t5xxl"]], np.int32))

    @staticmethod
    def empty_t5_tokens(batch: int = 1, length: int = 77) -> np.ndarray:
        """Token ids of the EMPTY prompt for T5: [</s>=1, 0, 0, …]. The
        reference encodes "" *through* T5 for the negative conditioning
        (sd3_infer.py:306-309) — its embeddings are non-zero, so CFG
        diverges if the T5 slot is zero-filled instead."""
        ids = np.zeros((batch, length), np.int32)
        ids[:, 0] = 1
        return ids

    def get_cond(self, clip_tokens: np.ndarray,
                 t5_tokens: Optional[np.ndarray],
                 clip_g_tokens: Optional[np.ndarray] = None,
                 clip_weights=None):
        """clip_tokens: (B, 77) for CLIP-L (and CLIP-G unless
        ``clip_g_tokens`` is given — the trio tokenizer pads L with EOS but
        G with 0); t5_tokens: (B, 77) or None. ``clip_weights`` (B, 77):
        per-token attention weights from the ``(text:w)`` syntax, applied
        to BOTH CLIP hidden streams (mean-preserving —
        io/prompt_weights.py). Returns (context, pooled)."""
        m = self.models
        toks = jnp.asarray(clip_tokens)
        toks_g = toks if clip_g_tokens is None else jnp.asarray(clip_g_tokens)
        if m.t5 is not None and t5_tokens is None:
            t5_tokens = self.empty_t5_tokens(toks.shape[0])
        has_w = clip_weights is not None
        w = (jnp.asarray(np.asarray(clip_weights, np.float32))
             if has_w else jnp.zeros((toks.shape[0], toks.shape[1]),
                                     jnp.float32))
        # module ids: a swap (e.g. quantize_int8 rebuilding int8_mm
        # modules) must compile fresh closures, not reuse bf16 ones
        key = (toks.shape[0], has_w, m.t5 is not None,
               id(m.clip_l), id(m.clip_g), id(m.t5))
        fn = self._enc_cache.get(key)
        if fn is None:
            def encode(params, toks, toks_g, t5_toks, w):
                _, l_hidden, l_pooled = m.clip_l.apply(
                    {"params": params["clip_l"]}, toks)
                _, g_hidden, g_pooled = m.clip_g.apply(
                    {"params": params["clip_g"]}, toks_g)
                if has_w:
                    from ..io.prompt_weights import apply_token_weights

                    l_hidden = apply_token_weights(l_hidden, w)
                    g_hidden = apply_token_weights(g_hidden, w)
                if m.t5 is not None:
                    t5_out = m.t5.apply({"params": params["t5"]}, t5_toks)
                else:
                    t5_out = jnp.zeros(
                        (toks.shape[0], 77, 4096), l_hidden.dtype)
                return assemble_sd3_cond(l_hidden, l_pooled, g_hidden,
                                         g_pooled, t5_out)

            fn = jax.jit(encode)
            self._enc_cache[key] = fn
        enc_params = {k: m.params.get(k) for k in
                      ("clip_l", "clip_g", "t5") if k in m.params}
        t5_arr = (jnp.asarray(t5_tokens) if m.t5 is not None
                  else jnp.zeros((toks.shape[0], 1), jnp.int32))
        return fn(enc_params, toks, toks_g, t5_arr, w)

    def get_cond_text(self, text: str):
        l_ids, g_ids, t5_ids = self.tokenize(text)
        return self.get_cond(l_ids, t5_ids, clip_g_tokens=g_ids)

    def denoise(self, latent, context, pooled, neg_context, neg_pooled,
                steps: int = 50, cfg_scale: float = 5.0,
                seed: int = 1, denoise_strength: float = 1.0,
                keep_trajectory: bool = False,
                per_sample_seeds=None, sampler: str = "euler"):
        """Noise + rectified-flow scan with batched CFG. ``sampler``:
        'euler' (reference parity) or 'heun' (2nd order — ~half the steps
        at equal ODE accuracy; 2 model calls per step). With
        ``keep_trajectory`` also returns every intermediate latent, like
        the reference sampler (utils.py:48-49).

        ``per_sample_seeds`` draws each sample's starting noise from its
        OWN key so a request batched by the serving layer reproduces
        identically at any batch size (flow Euler is deterministic after
        the initial noise)."""
        from ..ops.schedules import sd3_sigma_schedule

        m = self.models
        if not 0.0 < denoise_strength <= 1.0:
            raise ValueError("denoise_strength must be in (0, 1]")
        sigmas = sd3_sigma_schedule(steps, self.shift)
        start = int(steps * (1.0 - denoise_strength))
        sigmas = sigmas[start:]
        if per_sample_seeds is not None:
            if len(per_sample_seeds) != latent.shape[0]:
                raise ValueError("per_sample_seeds must match the batch")
            filled = np.asarray(
                [(s if s is not None else seed * 100003 + 17 * i + 1)
                 & 0xFFFFFFFF for i, s in enumerate(per_sample_seeds)],
                np.uint32)
            noise = jax.vmap(lambda s: jax.random.normal(
                jax.random.key(s), latent.shape[1:]))(jnp.asarray(filled))
        else:
            noise = jax.random.normal(jax.random.key(seed), latent.shape)
        # σ·noise + (1−σ)·latent (ModelSamplingDiscreteFlow.noise_scaling)
        x = noise_scaling(float(sigmas[0]), noise, latent)

        ctx = jnp.concatenate([context, neg_context], axis=0)
        pld = jnp.concatenate([pooled, neg_pooled], axis=0)
        b = latent.shape[0]
        sig_const = np.asarray(sigmas)

        # compile-once: the scan executable is cached per shape class and
        # schedule; sigmas bake in as constants, params stay arguments.
        # The key carries the schedule VALUES (tobytes), not just the
        # length — two (steps, denoise_strength) pairs can trim to
        # equal-length but different schedules — and id(m.mmdit) so a
        # module swap (quantize_int8 rebuilds int8_mm modules) can never
        # serve a stale closure.
        key = (x.shape, ctx.shape, sig_const.tobytes(), float(cfg_scale),
               sampler, keep_trajectory, id(m.mmdit))
        fn = self._denoise_cache.get(key)
        if fn is None:
            sample = {"euler": flow_euler_sample,
                      "heun": flow_heun_sample}[sampler]

            def run(mmdit_params, x, ctx, pld):
                def denoise_fn(xt, sigma):
                    xx = jnp.concatenate([xt, xt], axis=0)
                    t = jnp.broadcast_to(sigma * 1000.0, (2 * b,))
                    out = m.mmdit.apply({"params": mmdit_params}, xx, t,
                                        pld, ctx)
                    denoised = xx - out * sigma
                    pos, neg = jnp.split(denoised, 2, axis=0)
                    return neg + (pos - neg) * cfg_scale

                return sample(denoise_fn, x, steps=len(sig_const) - 1,
                              shift=self.shift, sigmas=sig_const,
                              keep_trajectory=keep_trajectory)

            fn = jax.jit(run)
            self._denoise_cache[key] = fn
        return fn(m.params["mmdit"], x, ctx, pld)

    def vae_decode(self, latent, mode: Optional[str] = None) -> np.ndarray:
        """Decode latents → uint8.

        ``"whole"`` decodes per image (the reference does too,
        sd3_infer.py:400-403): at 1024² the decoder's activation ladder is
        ~GiB-scale per image, and a batched whole-image decode at the
        all-resident op point (params ~9.5 GiB) exhausts HBM at batch ≥ 4
        — per-image chunks reuse the batch-1 executable and buffers.
        ``"tiled"`` streams the SAME params through row-strip programs
        (models/sd3_vae_tiled.py) whose live set is two full bf16 buffers
        + one strip workspace — exact, and decodes the whole batch without
        per-image serialization."""
        m = self.models
        mode = mode or self.decode_mode
        b = int(latent.shape[0])
        if mode == "tiled" or (mode == "auto" and b > 1
                               and latent.shape[1] >= 128):
            from ..models.sd3_vae_tiled import tiled_decode

            d = m.vae_decoder
            img = tiled_decode(
                m.params["vae_decoder"], SD3LatentFormat.process_out(latent),
                ch=d.ch, ch_mult=tuple(d.ch_mult),
                num_res_blocks=d.num_res_blocks,
                out_channels=d.out_channels, dtype=d.dtype)
            return np.asarray(jax.jit(to_uint8)(img))
        key = ((1,) + tuple(latent.shape[1:]), id(m.vae_decoder))
        fn = self._decode_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda p, z: to_uint8(m.vae_decoder.apply(
                {"params": p}, SD3LatentFormat.process_out(z))))
            self._decode_cache[key] = fn
        p = m.params["vae_decoder"]
        return np.concatenate(
            [np.asarray(fn(p, latent[i:i + 1]))
             for i in range(latent.shape[0])], axis=0)

    def vae_encode(self, images: np.ndarray, rng) -> jax.Array:
        m = self.models
        key = ("enc", np.shape(images), id(m.vae_encoder))
        fn = self._decode_cache.get(key)
        if fn is None:
            def encode(p, images, rng):
                h = m.vae_encoder.apply({"params": p}, images)
                mean, log_var = jnp.split(h, 2, axis=-1)
                log_var = jnp.clip(log_var, -30.0, 20.0)
                z = mean + jnp.exp(0.5 * log_var) * jax.random.normal(
                    rng, mean.shape, mean.dtype)
                return SD3LatentFormat.process_in(z)

            fn = jax.jit(encode)
            self._decode_cache[key] = fn
        return fn(m.params["vae_encoder"], jnp.asarray(images), rng)

    def gen_image(self, clip_tokens: np.ndarray,
                  t5_tokens: Optional[np.ndarray] = None,
                  neg_clip_tokens: Optional[np.ndarray] = None,
                  neg_t5_tokens: Optional[np.ndarray] = None,
                  width: int = 1024, height: int = 1024,
                  steps: int = 50, cfg_scale: float = 5.0, seed: int = 1,
                  init_image: Optional[np.ndarray] = None,
                  denoise_strength: float = 1.0,
                  offload_text_encoders: bool = False,
                  keep_trajectory: bool = False,
                  clip_g_tokens: Optional[np.ndarray] = None,
                  neg_clip_g_tokens: Optional[np.ndarray] = None,
                  per_sample_seeds=None, sampler: str = "euler",
                  clip_weights=None, neg_clip_weights=None):
        """Token-id entry point. ``offload_text_encoders`` frees the CLIP/T5
        param groups once conditioning is on device (the 16GB single-chip
        plan — ref sd3_infer.py:324-375); the inferencer is single-shot
        afterwards unless new text params are loaded. ``keep_trajectory``
        additionally returns RGB previews of every intermediate latent
        (ref decodes all 50: sd3_infer.py:400-403; here via the cheap
        latent→RGB preview matrix instead of 50 full VAE decodes)."""
        if neg_clip_tokens is None:
            neg_clip_tokens = np.zeros_like(clip_tokens)
        context, pooled = self.get_cond(clip_tokens, t5_tokens,
                                        clip_g_tokens=clip_g_tokens,
                                        clip_weights=clip_weights)
        neg_context, neg_pooled = self.get_cond(
            neg_clip_tokens, neg_t5_tokens,
            clip_g_tokens=neg_clip_g_tokens,
            clip_weights=neg_clip_weights)
        if offload_text_encoders:
            (context, pooled, neg_context, neg_pooled) = jax.block_until_ready(
                (context, pooled, neg_context, neg_pooled))
            self.models.free_text_encoders()
        if init_image is not None:
            latent = self.vae_encode(init_image,
                                     jax.random.key(seed + 1))
        else:
            latent = self.get_empty_latent(width, height)
            b = clip_tokens.shape[0]
            if latent.shape[0] != b:   # batched prompts share the blank
                latent = jnp.broadcast_to(latent, (b,) + latent.shape[1:])
        out = self.denoise(latent, context, pooled, neg_context,
                           neg_pooled, steps, cfg_scale, seed,
                           denoise_strength,
                           keep_trajectory=keep_trajectory,
                           per_sample_seeds=per_sample_seeds,
                           sampler=sampler)
        if keep_trajectory:
            latent, traj = out
            previews = np.asarray(
                SD3LatentFormat.decode_latent_to_preview(
                    traj.reshape((-1,) + traj.shape[2:])))
            return self.vae_decode(latent), previews
        return self.vae_decode(out)

    def gen_image_text(self, prompt: str, neg_prompt: str = "",
                       prompt_weighting: bool = False, **kwargs
                       ) -> np.ndarray:
        """Prompt-string entry point (ref gen_image, sd3_infer.py:383-405):
        fan the prompt through the CLIP-L/CLIP-G/T5 tokenizer trio, encode
        the (possibly empty) negative prompt through the same stack.
        ``prompt_weighting``: honor the ``(text:w)`` attention syntax on
        the CLIP streams (beyond-reference — the reference stubs weights
        to 1.0)."""
        if prompt_weighting:
            streams, w = self.tokenizer.encode_with_weights(prompt)
            nstreams, nw = self.tokenizer.encode_with_weights(neg_prompt)
            arr = lambda x: np.asarray([x], np.int32)
            return self.gen_image(
                arr(streams["l"]), t5_tokens=arr(streams["t5xxl"]),
                neg_clip_tokens=arr(nstreams["l"]),
                neg_t5_tokens=arr(nstreams["t5xxl"]),
                clip_g_tokens=arr(streams["g"]),
                neg_clip_g_tokens=arr(nstreams["g"]),
                clip_weights=np.asarray([w], np.float32),
                neg_clip_weights=np.asarray([nw], np.float32), **kwargs)
        l_ids, g_ids, t5_ids = self.tokenize(prompt)
        nl_ids, ng_ids, nt5_ids = self.tokenize(neg_prompt)
        return self.gen_image(
            l_ids, t5_tokens=t5_ids, neg_clip_tokens=nl_ids,
            neg_t5_tokens=nt5_ids, clip_g_tokens=g_ids,
            neg_clip_g_tokens=ng_ids, **kwargs)

    def gen_images_text(self, prompts, neg_prompts=None,
                        per_sample_seeds=None, **kwargs) -> np.ndarray:
        """Batched prompt-string entry point (serving): one text-encode +
        one denoise over the whole batch.  ``per_sample_seeds`` (one per
        prompt, ``None`` entries derive from ``seed``) keeps each request's
        image identical under any batch composition."""
        neg_prompts = list(neg_prompts or [""] * len(prompts))
        if len(neg_prompts) != len(prompts):
            raise ValueError("neg_prompts must match len(prompts)")

        def stack(texts):
            ids = [self.tokenize(t) for t in texts]
            return tuple(np.concatenate([t[i] for t in ids])
                         for i in range(3))

        l_ids, g_ids, t5_ids = stack(prompts)
        nl_ids, ng_ids, nt5_ids = stack(neg_prompts)
        return self.gen_image(
            l_ids, t5_tokens=t5_ids, neg_clip_tokens=nl_ids,
            neg_t5_tokens=nt5_ids, clip_g_tokens=g_ids,
            neg_clip_g_tokens=ng_ids, per_sample_seeds=per_sample_seeds,
            **kwargs)
