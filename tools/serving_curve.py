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


def sd3_int8_e2e_curve(batch_sizes=(1, 2, 4), steps=50, decode="auto"):
    """ALL-RESIDENT int8 SD3-medium END TO END (text encode → 50-step
    denoise → VAE decode) at image batch sizes — the serving mode
    docs/SD3_16GB.md establishes. Full scale (T5-XXL incl.), random
    weights, token-id entry (no tokenizer assets in this image).

    ``decode``: "whole" = per-image whole-image programs (the round-4
    mode), "tiled" = streamed row-strip decode of the whole batch,
    "auto" = tiled for batch > 1 at 1024²."""
    import numpy as np

    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import (
        SD3Inferencer, SD3Models)

    t0 = time.perf_counter()
    models = SD3Models.initialize(jax.random.key(0), dtype="bf16",
                                  depth=24, pos_embed_max_size=192,
                                  int8=True)
    inf = SD3Inferencer(models, shift=3.0, decode_mode=decode)
    print(f"[curve] sd3 int8 full-scale init: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    rng = np.random.default_rng(1)
    rows = []
    for bs in batch_sizes:
        ids = lambda hi: rng.integers(0, hi, (bs, 77)).astype(np.int32)
        kw = dict(t5_tokens=ids(32128), clip_g_tokens=ids(49408),
                  width=1024, height=1024, steps=steps, cfg_scale=5.0)
        t0 = time.perf_counter()
        img = inf.gen_image(ids(49408), seed=7, **kw)
        compile_s = time.perf_counter() - t0
        assert np.asarray(img).shape == (bs, 1024, 1024, 3)
        iters = 2
        t0 = time.perf_counter()
        for i in range(iters):
            np.asarray(inf.gen_image(ids(49408), seed=50 + i, **kw))
        dt = time.perf_counter() - t0
        ips, lat = bs * iters / dt, dt / iters
        rows.append((bs, ips, lat, compile_s))
        print(f"[curve] sd3-int8-e2e bs{bs}: {ips:.4f} imgs/s/chip, "
              f"{lat:.2f} s/batch (compile {compile_s:.0f}s)",
              file=sys.stderr)
    return rows


def sd3_load_test(rps=0.1, duration_s=420, buckets=(1, 2), steps=50):
    """p50/p95 under Poisson load against the int8 ALL-RESIDENT SD3
    backend (docs/SD3_16GB.md mode) through the DynamicBatcher. Offered
    ~0.1 rps sits just below the measured bs1 service rate (0.117
    imgs/s, docs/SERVING_CURVE.md) — queueing is real, and bucket-2
    coalescing (batched denoise + tiled batched decode) provides the
    headroom that keeps the system stable."""
    import random as _random

    import numpy as np

    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import (
        SD3Inferencer, SD3Models)
    from from_ddpm_to_stable_diffusion_tpu.serving.batcher import (
        DynamicBatcher, GenerateRequest)

    t0 = time.perf_counter()
    models = SD3Models.initialize(jax.random.key(0), dtype="bf16",
                                  depth=24, pos_embed_max_size=192,
                                  int8=True)
    # decode_mode="tiled" at EVERY batch: with both bucket executables
    # resident alongside the ~9.5 GiB params, even the b=1 whole-image
    # decode ladder OOMs 16 GB; the row-strip decoder's bounded live set
    # is the right default for the all-resident serving mode.
    inf = SD3Inferencer(models, shift=3.0, decode_mode="tiled")
    print(f"[sd3-load] int8 full-scale init: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    idrng = np.random.default_rng(1)

    def generate_fn(prompts, negatives, seeds):
        b = len(prompts)
        ids = lambda hi: idrng.integers(0, hi, (b, 77)).astype(np.int32)
        return np.asarray(inf.gen_image(
            ids(49408), t5_tokens=ids(32128), clip_g_tokens=ids(49408),
            width=1024, height=1024, steps=steps, cfg_scale=5.0,
            per_sample_seeds=[int(s) if s is not None else 0
                              for s in seeds]))

    batcher = DynamicBatcher(generate_fn, buckets=buckets)
    t0 = time.perf_counter()
    batcher.warmup(prompt="x")
    print(f"[sd3-load] warmup (all buckets compiled): "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rnd = _random.Random(0)
    futs = []
    t_end = time.monotonic() + duration_s
    n = 0
    while time.monotonic() < t_end:
        futs.append(batcher.submit(GenerateRequest(prompt="x", seed=n)))
        n += 1
        time.sleep(rnd.expovariate(rps))
    t0 = time.perf_counter()
    for f in futs:
        f.result(timeout=1200)
    drain = time.perf_counter() - t0
    m = batcher.metrics()
    batcher.shutdown()
    m["offered_rps"] = rps
    m["duration_s"] = duration_s
    m["drain_s"] = round(drain, 1)
    m["throughput_imgs_s"] = round(m["served"] / (duration_s + drain), 4)
    print(f"[sd3-load] {m}", file=sys.stderr)
    return m


def sd1_load_test(rps=1.1, duration_s=90, buckets=(1, 2, 4, 8)):
    """p50/p95 under load: Poisson arrivals into the bucketed
    DynamicBatcher over the shipped SD1 pipeline. Offered load just above
    the bs1 service rate (≈0.89 imgs/s) exercises real coalescing."""
    import random as _random

    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (
        SD1Generator, SD1Models)
    from from_ddpm_to_stable_diffusion_tpu.serving.batcher import (
        DynamicBatcher, GenerateRequest)

    models = SD1Models.initialize(jax.random.key(0), dtype="bf16")
    gen = SD1Generator(models, n_inference_steps=50)

    def generate_fn(prompts, negatives, seeds):
        return gen(list(prompts), uncond_prompts=list(negatives),
                   per_sample_seeds=list(seeds))

    batcher = DynamicBatcher(generate_fn, buckets=buckets)
    t0 = time.perf_counter()
    batcher.warmup(prompt="a photograph of an astronaut riding a horse")
    print(f"[load] warmup (all buckets compiled): "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rnd = _random.Random(0)
    futs = []
    t_end = time.monotonic() + duration_s
    n = 0
    while time.monotonic() < t_end:
        futs.append(batcher.submit(GenerateRequest(
            prompt="a photograph of an astronaut riding a horse",
            seed=n)))
        n += 1
        time.sleep(rnd.expovariate(rps))
    t0 = time.perf_counter()
    for f in futs:
        f.result(timeout=600)
    drain = time.perf_counter() - t0
    m = batcher.metrics()
    batcher.shutdown()
    m["offered_rps"] = rps
    m["duration_s"] = duration_s
    m["drain_s"] = round(drain, 1)
    m["throughput_imgs_s"] = round(m["served"] / (duration_s + drain), 3)
    print(f"[load] {m}", file=sys.stderr)
    return m


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-sd1", action="store_true")
    ap.add_argument("--skip-sd3", action="store_true")
    ap.add_argument("--sd3-e2e", action="store_true",
                    help="full-scale int8 all-resident SD3 end-to-end curve")
    ap.add_argument("--decode", default="auto",
                    choices=("auto", "whole", "tiled"),
                    help="VAE decode mode for --sd3-e2e")
    ap.add_argument("--sd3-bs", type=int, nargs="*", default=None,
                    help="batch sizes for --sd3-e2e (default 1 2 4)")
    ap.add_argument("--load", action="store_true",
                    help="SD1 Poisson load test through the DynamicBatcher")
    ap.add_argument("--sd3-load", action="store_true",
                    help="SD3 int8 all-resident Poisson load test")
    args = ap.parse_args()
    print(f"[curve] devices: {jax.devices()}", file=sys.stderr)
    if not args.skip_sd1:
        sd1 = sd1_curve()
        print("\n| SD1 batch | imgs/s/chip | s/batch |")
        print("|---|---|---|")
        for bs, ips, lat, _ in sd1:
            print(f"| {bs} | {ips:.3f} | {lat:.2f} |")
    if not args.skip_sd3:
        sd3 = sd3_batched()
        print("\n| SD3 image batch | ms/step | ms/step/image |")
        print("|---|---|---|")
        for bs, ms, per, _ in sd3:
            print(f"| {bs} | {ms:.1f} | {per:.1f} |")
    if args.sd3_e2e:
        rows = sd3_int8_e2e_curve(batch_sizes=tuple(args.sd3_bs or (1, 2, 4)),
                                  decode=args.decode)
        print(f"\n| SD3 int8 e2e batch (decode={args.decode}) "
              f"| imgs/s/chip | s/batch |")
        print("|---|---|---|")
        for bs, ips, lat, _ in rows:
            print(f"| {bs} | {ips:.4f} | {lat:.2f} |")
    if args.sd3_load:
        m = sd3_load_test()
        print(f"\nSD3 int8 load test @ {m['offered_rps']} rps Poisson: "
              f"{m['throughput_imgs_s']} imgs/s served, "
              f"p50 {m.get('latency_ms_p50', 0)/1e3:.2f} s, "
              f"p95 {m.get('latency_ms_p95', 0)/1e3:.2f} s, "
              f"mean real batch "
              f"{m['batched_requests'] / max(1, m['batches']):.2f}")
    if args.load:
        m = sd1_load_test()
        print(f"\nSD1 load test @ {m['offered_rps']} rps Poisson: "
              f"{m['throughput_imgs_s']} imgs/s served, "
              f"p50 {m.get('latency_ms_p50', 0)/1e3:.2f} s, "
              f"p95 {m.get('latency_ms_p95', 0)/1e3:.2f} s, "
              f"mean real batch "
              f"{m['batched_requests'] / max(1, m['batches']):.2f}")


if __name__ == "__main__":
    main()
