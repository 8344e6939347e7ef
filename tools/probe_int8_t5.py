"""T5-XXL serving op point (B·154 tokens, weight-read-bound): bf16 vs
W8A16 (int8 weights converted inline) vs W8A8 (shipped int8_dot)."""
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


def timed(fn, *a):
    float(jnp.sum(fn(*a)))
    t0 = time.perf_counter()
    float(jnp.sum(fn(*a)))
    return (time.perf_counter() - t0) / ITERS


for m, k, n in [(154, 4096, 10240), (154, 10240, 4096), (616, 4096, 10240)]:
    key = jax.random.key(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.bfloat16)
    q, s = quantize_per_channel(w, axis=0)

    def loop(f):
        def body(i, carry):
            xx = x + carry[:1, :1].astype(x.dtype)
            return f(xx).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((m, n), jnp.bfloat16))

    fb = jax.jit(lambda: loop(lambda a: jax.lax.dot(
        a, w, preferred_element_type=jnp.float32)))
    fw8 = jax.jit(lambda: loop(lambda a: jax.lax.dot(
        a, q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)))
    fq = jax.jit(lambda: loop(lambda a: int8_dot(a, q, s)))
    t_b, t_w8, t_q = timed(fb), timed(fw8), timed(fq)
    gb = k * n / 1e9  # weight bytes read per iter (int8); ×2 for bf16
    print(f"({m},{k})x({k},{n}): bf16 {t_b*1e3:6.3f} ms "
          f"({2*gb/t_b:5.0f} GB/s)  W8A16 {t_w8*1e3:6.3f} ms  "
          f"W8A8 {t_q*1e3:6.3f} ms ({gb/t_q:5.0f} GB/s)  "
          f"best speedup {t_b/min(t_w8,t_q):4.2f}x", flush=True)
