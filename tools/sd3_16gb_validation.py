"""Hardware validation of the SD3-on-16GB phase plan (VERDICT r1 item 4).

Runs the FULL-SCALE SD3-medium stack (MMDiT depth 24, CLIP-L/G, T5-XXL
4.7B, 16-ch VAE; random weights — no checkpoints exist in this image) on
one 16GB v5e at the reference op point (1024², 50 steps, CFG 5), with the
reference's phase choreography (sd3_infer.py:324-375) mapped to buffer
lifetime: encode text → free the text-encoder HBM → denoise → decode.
Prints the HBM high-water mark after each phase.

Memory discipline:
- each model's params are created by ONE jitted init+bf16-cast program, so
  the fp32 init values are per-buffer intermediates XLA frees as it goes
  (a naive eager fp32 init of T5-XXL alone is 18.8GB — more than HBM);
- MMDiT is initialized only AFTER the text encoders are freed, mirroring
  the checkpoint-loading order a 16GB deployment must use.

Usage: python tools/sd3_16gb_validation.py [--steps 50] [--res 1024]
                                           [--int8]

``--int8``: the ALL-RESIDENT serving mode — MMDiT + T5 projections are
W8A8 int8 (ops/quantize.py), shrinking the param sum from ~15.6 GiB bf16
to ~9.5 GiB, so every model stays on-chip for the whole run and a second
prompt re-encodes WITHOUT re-initializing anything (no phase offload).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
from from_ddpm_to_stable_diffusion_tpu.models.sd3_vae import (SD3LatentFormat,
                                                              SD3VAEDecoder)
from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
    CLIP_G_CONFIG, CLIP_L_CONFIG, CLIPTextModel, T5Config, T5Encoder)
from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import (
    assemble_sd3_cond, noise_scaling)
def hbm_gb():
    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("bytes_in_use", 0) / 2**30, \
        stats.get("peak_bytes_in_use", 0) / 2**30


def report(phase):
    live, peak = hbm_gb()
    print(f"[sd3-16gb] {phase:<34s} live {live:6.2f} GiB  peak {peak:6.2f} "
          f"GiB", flush=True)


def jit_init_bf16(model, *args, int8=False):
    """One program: init + cast-to-bf16 (+ optional int8 quantization) —
    fp32 init values never co-reside as a whole tree."""

    def g(key):
        params = model.init(key, *args)["params"]
        params = jax.tree_util.tree_map(
            lambda p: (p.astype(jnp.bfloat16)
                       if p.ndim >= 1 and jnp.issubdtype(p.dtype,
                                                         jnp.floating)
                       else p), params)
        if int8:
            from from_ddpm_to_stable_diffusion_tpu.ops.quantize import (
                quantize_tree)

            params = quantize_tree(params)
        return params

    return jax.jit(g)(jax.random.key(0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 MMDiT+T5; keep ALL models resident")
    args = ap.parse_args()
    n_params = lambda t: sum(int(np.prod(p.shape))
                             for p in jax.tree_util.tree_leaves(t))
    report("start")

    # ---- phase 1: text encoders + conditioning --------------------------
    t0 = time.perf_counter()
    clip_l = CLIPTextModel(CLIP_L_CONFIG, intermediate_output=-2,
                           dtype=jnp.bfloat16)
    clip_g = CLIPTextModel(CLIP_G_CONFIG, intermediate_output=-2,
                           dtype=jnp.bfloat16)
    t5 = T5Encoder(T5Config(int8_mm=args.int8), dtype=jnp.bfloat16)
    toks = jnp.zeros((1, 77), jnp.int32)
    p_l = jit_init_bf16(clip_l, toks)
    p_g = jit_init_bf16(clip_g, toks)
    p_t5 = jit_init_bf16(T5Encoder(T5Config(), dtype=jnp.bfloat16), toks,
                         int8=args.int8)
    print(f"[sd3-16gb] text encoders: CLIP-L {n_params(p_l)/1e6:.0f}M  "
          f"CLIP-G {n_params(p_g)/1e6:.0f}M  T5 {n_params(p_t5)/1e9:.2f}B  "
          f"(init {time.perf_counter()-t0:.0f}s)", flush=True)
    report("text encoders resident")

    def encode(p_l, p_g, p_t5, toks):
        _, l_h, l_pool = clip_l.apply({"params": p_l}, toks)
        _, g_h, g_pool = clip_g.apply({"params": p_g}, toks)
        t5_out = t5.apply({"params": p_t5}, toks)
        return assemble_sd3_cond(l_h, l_pool, g_h, g_pool, t5_out)

    enc = jax.jit(encode)
    ctx, pooled = enc(p_l, p_g, p_t5, toks)
    neg_ctx, neg_pooled = enc(p_l, p_g, p_t5, jnp.ones((1, 77), jnp.int32))
    ctx, pooled, neg_ctx, neg_pooled = jax.device_get(
        (ctx, pooled, neg_ctx, neg_pooled))  # host copies survive the free
    report("conditioning computed")

    if args.int8:
        report("text encoders stay resident (int8 mode)")
    else:
        # ---- free text encoders (the reference's .cpu() offload) --------
        for tree in (p_l, p_g, p_t5):
            for leaf in jax.tree_util.tree_leaves(tree):
                leaf.delete()
        del p_l, p_g, p_t5
        report("text encoders freed")

    # ---- phase 2: MMDiT-medium denoise ---------------------------------
    t0 = time.perf_counter()
    cfg = MMDiTConfig(depth=24, pos_embed_max_size=192, int8_mm=args.int8)
    mmdit = MMDiT(cfg, dtype=jnp.bfloat16)
    h8 = args.res // 8
    x0 = jnp.zeros((2, h8, h8, 16))
    p_mm = jit_init_bf16(
        MMDiT(MMDiTConfig(depth=24, pos_embed_max_size=192),
              dtype=jnp.bfloat16),
        x0, jnp.zeros((2,)), jnp.zeros((2, 2048)),
        jnp.zeros((2, 154, 4096)), int8=args.int8)
    print(f"[sd3-16gb] MMDiT {n_params(p_mm)/1e9:.2f}B "
          f"(init {time.perf_counter()-t0:.0f}s)", flush=True)
    report("MMDiT resident")

    from from_ddpm_to_stable_diffusion_tpu.ops.schedules import (
        sd3_sigma_schedule)

    sigmas = np.asarray(sd3_sigma_schedule(args.steps, 3.0))
    ctx2 = jnp.concatenate([jnp.asarray(ctx), jnp.asarray(neg_ctx)], axis=0)
    pld2 = jnp.concatenate([jnp.asarray(pooled), jnp.asarray(neg_pooled)],
                           axis=0)

    @jax.jit
    def step(p_mm, xt, sigma, sigma_next):
        xx = jnp.concatenate([xt, xt], axis=0)
        t = jnp.broadcast_to(sigma * 1000.0, (2,))
        out = mmdit.apply({"params": p_mm}, xx, t, pld2, ctx2)
        den = xx - out * sigma
        pos, neg = jnp.split(den, 2, axis=0)
        den = neg + (pos - neg) * 5.0
        d = (xt - den) / jnp.maximum(sigma, 1e-8)
        return xt + d * (sigma_next - sigma)

    noise = jax.random.normal(jax.random.key(1), (1, h8, h8, 16))
    x = noise_scaling(float(sigmas[0]), noise, jnp.zeros_like(noise) + 0.0609)
    t0 = time.perf_counter()
    for i in range(len(sigmas) - 1):
        x = step(p_mm, x, jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]))
    x = jax.device_get(x)
    dt = time.perf_counter() - t0
    print(f"[sd3-16gb] {args.steps} denoise steps at {args.res}²: "
          f"{dt:.1f}s ({dt/(len(sigmas)-1)*1e3:.0f} ms/step incl. compile "
          f"on first)", flush=True)
    report("denoise done")

    # ---- phase 3: decode (MMDiT freed first unless all-resident) --------
    if args.int8:
        report("MMDiT stays resident (int8 mode)")
    else:
        for leaf in jax.tree_util.tree_leaves(p_mm):
            leaf.delete()
        del p_mm
        report("MMDiT freed")
    vae_d = SD3VAEDecoder(dtype=jnp.bfloat16)
    z = SD3LatentFormat.process_out(jnp.asarray(x))
    p_vd = jit_init_bf16(vae_d, z)
    img = jax.jit(lambda p, z: vae_d.apply({"params": p}, z))(p_vd, z)
    img = jax.device_get(img)
    report("decode done")
    if args.int8:
        # the serving payoff: a second prompt goes straight to encode +
        # denoise — every model is still on-chip, nothing re-initializes
        t0 = time.perf_counter()
        _ = jax.device_get(
            enc(p_l, p_g, p_t5, jnp.full((1, 77), 2, jnp.int32)))
        x2 = step(p_mm, jnp.asarray(x),
                  jnp.float32(sigmas[-2]), jnp.float32(sigmas[-1]))
        jax.device_get(x2)
        report("second prompt encode+step (all resident)")
        print(f"[sd3-16gb] second-prompt turnaround (encode + 1 step, no "
              f"reload): {time.perf_counter()-t0:.2f}s", flush=True)
        print(f"[sd3-16gb] image {img.shape} OK — full SD3-medium stack "
              f"(incl. T5-XXL) ALL-RESIDENT on one 16GB chip via int8 "
              f"(no phase offload)", flush=True)
    else:
        print(f"[sd3-16gb] image {img.shape} OK — full SD3-medium stack "
              f"(incl. T5-XXL) served from one 16GB chip via phase offload",
              flush=True)


if __name__ == "__main__":
    main()
