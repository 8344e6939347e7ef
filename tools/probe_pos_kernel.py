"""Micro-bench of flash_attention_pos at the SD3 x-by-x op point
(2,24,4096,64) — the harness for per-logit kernel experiments."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention_pos)

ITERS = 30
L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
q, k, v = (jax.random.normal(jax.random.key(i), (2, 24, L, 64),
                             jnp.bfloat16) for i in range(3))
z = jnp.zeros((2,), jnp.int32)


def loop(q, k, v):
    def body(i, carry):
        qq = q + carry[:, :, :1, :1].astype(q.dtype) * 0
        o, lse = flash_attention_pos(qq, k, v, z, z, scale=64 ** -0.5)
        return o.astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros_like(q))


f = jax.jit(loop)
float(jnp.sum(f(q, k, v)))
t0 = time.perf_counter()
float(jnp.sum(f(q, k, v)))
dt = (time.perf_counter() - t0) / ITERS
n_logits = 2 * 24 * L * L
print(f"pos kernel L={L}: {dt*1e3:.3f} ms "
      f"({n_logits/dt/1e9:.0f} Glogits/s)", flush=True)
