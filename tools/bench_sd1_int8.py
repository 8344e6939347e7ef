"""SD1 pipeline + denoise step: bf16 vs int8 attention/GEGLU projections.

Run: python tools/bench_sd1_int8.py [int8|bf16|both]
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


def bench(int8: bool):
    tag = "int8" if int8 else "bf16"
    models = SD1Models.initialize(jax.random.key(0), dtype="bf16")
    if int8:
        models.quantize_int8()
    gen = SD1Generator(models, n_inference_steps=50)
    t0 = time.perf_counter()
    img = gen(["a photograph of an astronaut riding a horse"], seed=42)
    print(f"[{tag}] pipeline warmup+compile: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for i in range(3):
        img = gen(["a photograph of an astronaut riding a horse"],
                  seed=100 + i)
    dt = (time.perf_counter() - t0) / 3
    assert img.dtype == np.uint8

    # step-level timing on the same executable
    from from_ddpm_to_stable_diffusion_tpu.samplers.k_samplers import (
        make_sampler_body)

    _, make_carry, _ = make_sampler_body(lambda x, t: x, gen.cfg,
                                         rng=jax.random.key(0),
                                         tables=gen.tables)
    latents = jax.random.normal(jax.random.key(1), (1, 64, 64, 4))
    ctx = gen._clip(models.params["clip"], jnp.zeros((2, 77), jnp.int32))
    state = (make_carry(latents), ctx, jax.random.key(0), jnp.int32(0))
    step = gen._get_step(1)
    up = models.params["unet"]
    state = step(up, state)
    float(jnp.sum(state[0][0]))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(up, state)
    float(jnp.sum(state[0][0]))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"[{tag}] pipeline {dt:.3f} s/image ({1/dt:.3f} imgs/s), "
          f"denoise step {ms:.2f} ms", flush=True)
    return dt, ms


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("int8", "both"):
        i8 = bench(True)
    if which in ("bf16", "both"):
        b16 = bench(False)
    if which == "both":
        print(f"step speedup: {b16[1]/i8[1]:.3f}x  "
              f"pipeline speedup: {b16[0]/i8[0]:.3f}x")
