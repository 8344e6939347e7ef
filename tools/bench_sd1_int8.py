"""SD1 pipeline + denoise step: bf16 vs int8 attention/GEGLU projections.

Run: python tools/bench_sd1_int8.py [int8|bf16|both] [bs ...]

Default batch sizes 1 4 8: the round-4 verdict flagged that the 0.85×
bs1 dead-end note extrapolated beyond its data — serving runs bs4-8
where the matmul K/M dims grow and amortize the dynamic-quant overhead.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (  # noqa: E402
    SD1Generator, SD1Models)


def bench(int8: bool, batch_sizes=(1, 4, 8), pipeline_bs1: bool = True):
    tag = "int8" if int8 else "bf16"
    models = SD1Models.initialize(jax.random.key(0), dtype="bf16")
    if int8:
        models.quantize_int8()
    gen = SD1Generator(models, n_inference_steps=50)
    dt = float("nan")
    if pipeline_bs1:
        t0 = time.perf_counter()
        img = gen(["a photograph of an astronaut riding a horse"], seed=42)
        print(f"[{tag}] pipeline warmup+compile: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for i in range(3):
            img = gen(["a photograph of an astronaut riding a horse"],
                      seed=100 + i)
        dt = (time.perf_counter() - t0) / 3
        assert img.dtype == np.uint8
        print(f"[{tag}] pipeline {dt:.3f} s/image ({1/dt:.3f} imgs/s)",
              flush=True)

    # step-level timing per batch size on the shipped step executable
    from from_ddpm_to_stable_diffusion_tpu.samplers.k_samplers import (
        make_sampler_body)

    _, make_carry, _ = make_sampler_body(lambda x, t: x, gen.cfg,
                                         rng=jax.random.key(0),
                                         tables=gen.tables)
    up = models.params["unet"]
    step_ms = {}
    for bs in batch_sizes:
        latents = jax.random.normal(jax.random.key(1), (bs, 64, 64, 4))
        ctx = gen._clip(models.params["clip"],
                        jnp.zeros((2 * bs, 77), jnp.int32))
        state = (make_carry(latents), ctx, jax.random.key(0), jnp.int32(0))
        step = gen._get_step(bs)
        state = step(up, state)
        float(jnp.sum(state[0][0]))
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            state = step(up, state)
        float(jnp.sum(state[0][0]))
        ms = (time.perf_counter() - t0) / n * 1e3
        step_ms[bs] = ms
        print(f"[{tag}] denoise step bs{bs}: {ms:.2f} ms "
              f"({bs / ms * 1e3:.2f} latents/s)", flush=True)
    return dt, step_ms


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    bss = tuple(int(a) for a in sys.argv[2:]) or (1, 4, 8)
    if which in ("int8", "both"):
        i8 = bench(True, bss)
    if which in ("bf16", "both"):
        b16 = bench(False, bss)
    if which == "both":
        for bs in bss:
            print(f"bs{bs}: step speedup int8/bf16 = "
                  f"{b16[1][bs]/i8[1][bs]:.3f}x", flush=True)
