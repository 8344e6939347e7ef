"""Why is SD3 joint attention slow? Controls at the 4250-token op point:
- D=64 H=24 (SD3-medium) vs D=128 H=12 (same matmul FLOPs, half the
  logit count) -> if time halves, the kernel is softmax/VPU-bound.
- asymmetric block_k sweep.
- jnp reference (unfused XLA attention) for scale.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention)

ITERS = 30
L = 4352


def timed(fn, *a):
    float(jnp.sum(fn(*a)))
    t0 = time.perf_counter()
    float(jnp.sum(fn(*a)))
    return (time.perf_counter() - t0) / ITERS


def xla_attn(q, k, v):
    s = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * s
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


def run(h, d, bq, bk, impl="flash"):
    q, k, v = (jax.random.normal(jax.random.key(i), (2, h, L, d),
                                 jnp.bfloat16) for i in range(3))

    def loop(q, k, v):
        def body(i, carry):
            qq = q + carry[:, :, :1, :1].astype(q.dtype) * 0
            if impl == "flash":
                o = flash_attention(qq, k, v, block_q=bq, block_k=bk)
            else:
                o = xla_attn(qq, k, v)
            return o.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros_like(q))

    dt = timed(jax.jit(loop), q, k, v)
    print(f"H={h} D={d} {impl} bq={bq} bk={bk}: {dt*1e3:7.3f} ms", flush=True)
    return dt


run(24, 64, 1024, 1024)
run(24, 64, 1024, 2048)   # bigger k blocks: slower (7.7 ms)
# bq=2048 and bk>=4096 VMEM-OOM the v5e (17.7M scoped > 16M limit)
run(12, 128, 1024, 1024)
run(24, 64, 0, 0, impl="xla")
