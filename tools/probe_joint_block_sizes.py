"""Flash block-size sweep at the SD3-medium joint-attention op point:
L=4250 (154 ctx + 4096 latent), B2 H24 D64. L=4250 pads to 5120 at block
1024 (20% waste + materialized pad/slice); 4352 = 17x256 is pad-free at
block 256."""
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


def timed(fn, *a):
    float(jnp.sum(fn(*a)))
    t0 = time.perf_counter()
    float(jnp.sum(fn(*a)))
    return (time.perf_counter() - t0) / ITERS


for L, blk in [(4250, 1024), (4250, 512), (4250, 256),
               (4352, 1024), (4352, 512), (4352, 256), (4352, 128)]:
    q, k, v = (jax.random.normal(jax.random.key(i), (2, 24, L, 64),
                                 jnp.bfloat16) for i in range(3))

    def loop(q, k, v, blk=blk):
        def body(i, carry):
            qq = q + carry[:, :, :1, :1].astype(q.dtype) * 0
            o = flash_attention(qq, k, v, block_q=blk, block_k=blk)
            return o.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros_like(q))

    f = jax.jit(loop)
    dt = timed(f, q, k, v)
    print(f"L={L} block={blk}: {dt*1e3:7.3f} ms", flush=True)
