"""Probe the shipped int8_dot (dynamic per-token quant + dequant epilogue)
vs a plain bf16 dot at MMDiT joint-block shapes."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.ops.quantize import (  # noqa: E402
    int8_dot, quantize_per_channel)

ITERS = 50


def timed(fn, *args):
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / ITERS


# (M tokens, K, N) for qkv / fc1 / fc2 at SD3-medium, CFG batch 2
for m, k, n in [(8500, 1536, 4608), (8500, 1536, 6144), (8500, 6144, 1536),
                (8192, 1536, 6144)]:
    key = jax.random.key(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.bfloat16)
    q, s = quantize_per_channel(w, axis=0)

    def loop(f, *extra):
        def body(i, carry):
            xx = x + carry[:1, :1].astype(x.dtype)
            return f(xx, *extra).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((m, n), jnp.bfloat16))

    fbf = jax.jit(lambda: loop(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.float32), w))
    fq = jax.jit(lambda: loop(int8_dot, q, s))
    dt16, dt8 = timed(fbf), timed(fq)
    fl = 2 * m * k * n
    print(f"({m},{k})x({k},{n}): bf16 {dt16*1e3:6.3f} ms "
          f"({fl/dt16/1e12:6.1f} TF/s)  int8_dot {dt8*1e3:6.3f} ms "
          f"({fl/dt8/1e12:6.1f} TOP/s)  speedup {dt16/dt8:4.2f}x",
          flush=True)
