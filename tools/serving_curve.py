"""Measure the SD1 serving throughput curve + batched SD3 pipeline.

VERDICT r2 #9: the bs1→bs4 gain (0.90→1.11 imgs/s) needs the rest of the
curve to justify the compute-bound claim at serving batch sizes.  This
tool measures the SHIPPED SD1Generator pipeline at bs ∈ {1, 4, 8, 16}
(each batch size is its own executable; compiles are cached in
/tmp/fdsd_tpu_cache) and an SD3 step at CFG-batch 2·bs for bs ∈ {1, 2}.

Run on the TPU:  python tools/serving_curve.py
Writes a markdown table to stdout (paste into docs/SERVING_CURVE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sd1_curve(batch_sizes=(1, 4, 8, 16), steps=50):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (
        SD1Generator, SD1Models)

    models = SD1Models.initialize(jax.random.key(0), dtype="bf16")
    gen = SD1Generator(models, n_inference_steps=steps)
    rows = []
    prompt = "a photograph of an astronaut riding a horse"
    for bs in batch_sizes:
        prompts = [prompt] * bs
        t0 = time.perf_counter()
        img = gen(prompts, seed=7)
        compile_s = time.perf_counter() - t0
        assert img.shape == (bs, 512, 512, 3)
        iters = max(1, 8 // bs)
        t0 = time.perf_counter()
        for i in range(iters):
            gen(prompts, seed=50 + i)
        dt = time.perf_counter() - t0
        ips = bs * iters / dt
        lat = dt / iters
        rows.append((bs, ips, lat, compile_s))
        print(f"[curve] sd1 bs{bs}: {ips:.3f} imgs/s/chip, "
              f"{lat:.2f} s/batch (compile {compile_s:.0f}s)",
              file=sys.stderr)
    return rows


def sd3_batched(batch_sizes=(1, 2)):
    """SD3-medium denoise step at CFG-batch 2·bs, 1024² (the MMDiT is the
    dominant cost; text-encode amortization is measured by the per-image
    share of one 77-token encode ≈ negligible vs 50·step)."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=24, pos_embed_max_size=192)
    model = MMDiT(cfg, dtype=jnp.bfloat16)
    rows = []
    for bs in batch_sizes:
        b = 2 * bs
        x = jnp.zeros((b, 128, 128, 16))
        y = jnp.zeros((b, 2048))
        ctx = jnp.zeros((b, 154, 4096))
        params = jax.jit(model.init)(jax.random.key(0), x, jnp.zeros((b,)),
                                     y, ctx)

        @jax.jit
        def denoise(params, xt, sigma, y=y, ctx=ctx, b=b):
            tt = jnp.broadcast_to(sigma * 1000.0, (b,))
            out = model.apply(params, xt, tt, y, ctx)
            return xt - out * sigma

        xt = jax.random.normal(jax.random.key(1), (b, 128, 128, 16))
        t0 = time.perf_counter()
        xt = denoise(params, xt, jnp.float32(1.0))
        float(jnp.sum(xt))
        compile_s = time.perf_counter() - t0
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            xt = denoise(params, xt, jnp.float32(1.0 - i * 0.02))
        float(jnp.sum(xt))
        ms = (time.perf_counter() - t0) / n * 1e3
        rows.append((bs, ms, ms / bs, compile_s))
        print(f"[curve] sd3 image-batch {bs} (CFG batch {b}): "
              f"{ms:.1f} ms/step, {ms / bs:.1f} ms/step/image "
              f"(compile {compile_s:.0f}s)", file=sys.stderr)
        del params, xt
    return rows


def main():
    print(f"[curve] devices: {jax.devices()}", file=sys.stderr)
    sd1 = sd1_curve()
    sd3 = sd3_batched()
    print("\n| SD1 batch | imgs/s/chip | s/batch |")
    print("|---|---|---|")
    for bs, ips, lat, _ in sd1:
        print(f"| {bs} | {ips:.3f} | {lat:.2f} |")
    print("\n| SD3 image batch | ms/step | ms/step/image |")
    print("|---|---|---|")
    for bs, ms, per, _ in sd3:
        print(f"| {bs} | {ms:.1f} | {per:.1f} |")


if __name__ == "__main__":
    main()
