"""Probe: does the v5e MXU int8 path (2x bf16 TOPS) materialize through
XLA on this relay?  Times bf16 vs int8 matmuls of SD1/SD3-ish shapes with
an on-device fori_loop (per-call host dispatch would swamp the kernel).

Run standalone: python tools/probe_int8.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 50


def timed(fn, *args):
    out = fn(*args)           # compile
    float(jnp.sum(out))       # honest sync = host transfer
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, s


def loop_dot(a, b, acc_dtype):
    def body(i, carry):
        # data-dependent tweak defeats CSE across iterations
        x = a + carry[:1, :1].astype(a.dtype)
        return jax.lax.dot(x, b, preferred_element_type=acc_dtype)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(
        (a.shape[0], b.shape[1]), acc_dtype))


for m, k, n in [(4096, 4096, 4096), (8192, 2048, 8192), (16384, 1280, 5120)]:
    flops = 2 * m * k * n
    key = jax.random.key(0)
    a16 = jax.random.normal(key, (m, k), jnp.bfloat16)
    b16 = jax.random.normal(key, (k, n), jnp.bfloat16)
    a8 = (a16 * 10).astype(jnp.int8)
    b8 = (b16 * 10).astype(jnp.int8)

    f16 = jax.jit(lambda a, b: loop_dot(a, b, jnp.float32))
    f8 = jax.jit(lambda a, b: loop_dot(a, b, jnp.int32))
    dt16, _ = timed(f16, a16, b16)
    dt8, _ = timed(f8, a8, b8)
    print(f"({m},{k})x({k},{n}): bf16 {dt16*1e3:7.3f} ms "
          f"({flops/dt16/1e12:6.1f} TF/s)  int8 {dt8*1e3:7.3f} ms "
          f"({flops/dt8/1e12:6.1f} TOP/s)  speedup {dt16/dt8:4.2f}x",
          flush=True)
