"""Probe int8_dot epilogue/prologue variants at SD3 joint-block shapes.

The sd3i8 step profile shows ~14 ms/step of `convert` + ~4 ms of abs-max
reduces around the int8 matmuls (tools/profile_step.py sd3i8 --cat
convert). Candidates:
  A  shipped: x→fp32 (shared buffer), amax, quantize; acc int32 → fp32
     · xs · ws → bf16
  B  dot emits preferred fp32 directly (epilogue convert folded into the
     MXU drain if the compiler supports it)
  C  per-consumer casts (no shared fp32 x buffer — lets XLA fuse the
     bf16→fp32 convert into the reduce and the quantize passes
     separately)
  D  B + C combined
Each variant must match A bit-for-bit (same quantized values) — this is a
pure scheduling/fusion experiment.

Run: python tools/probe_int8_dequant.py
"""
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


def int8_dot_b(x, q, scale):
    xf = x.astype(jnp.float32)
    xmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(xmax, 1e-8) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (acc * xs * scale).astype(x.dtype)


def int8_dot_c(x, q, scale):
    xmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(xmax, 1e-8) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * scale).astype(x.dtype)


def int8_dot_d(x, q, scale):
    xmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(xmax, 1e-8) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (acc * xs * scale).astype(x.dtype)


def timed(fn):
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    float(jnp.sum(fn()))
    return (time.perf_counter() - t0) / ITERS


for m, k, n in [(8500, 1536, 4608), (8500, 6144, 1536)]:
    key = jax.random.key(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.bfloat16)
    q, s = quantize_per_channel(w, axis=0)

    # exactness first (same quantization → identical outputs expected)
    outs = {nm: f(x, q, s) for nm, f in
            [("A", int8_dot), ("B", int8_dot_b), ("C", int8_dot_c),
             ("D", int8_dot_d)]}
    for nm in "BCD":
        d = float(jnp.max(jnp.abs(outs[nm].astype(jnp.float32)
                                  - outs["A"].astype(jnp.float32))))
        print(f"  variant {nm} vs A max|Δ| = {d:.3e}", flush=True)

    def loop(f):
        def body(i, carry):
            xx = x + carry[:1, :1].astype(x.dtype)
            return f(xx, q, s).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((m, n), jnp.bfloat16))

    times = {nm: timed(jax.jit(lambda f=f: loop(f)))
             for nm, f in [("A", int8_dot), ("B", int8_dot_b),
                           ("C", int8_dot_c), ("D", int8_dot_d)]}
    base = times["A"]
    msg = "  ".join(f"{nm} {t*1e3:6.3f} ms ({base/t:4.2f}x)"
                    for nm, t in times.items())
    print(f"({m},{k})x({k},{n}): {msg}", flush=True)
