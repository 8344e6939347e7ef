"""SD3-medium denoise step: bf16 vs W8A8 int8 joint-block projections.

Same op point as bench.py (1024², CFG ×2, 154+4096 joint tokens).
Run: python tools/bench_sd3_int8.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,  # noqa: E402
                                                            MMDiTConfig)
from from_ddpm_to_stable_diffusion_tpu.ops.quantize import quantize_tree  # noqa: E402
import dataclasses  # noqa: E402

ITERS = 10


def bench(int8: bool):
    cfg = MMDiTConfig(depth=24, pos_embed_max_size=192, int8_mm=int8)
    model = MMDiT(cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 128, 128, 16))
    t = jnp.zeros((2,))
    y = jnp.zeros((2, 2048))
    ctx = jnp.zeros((2, 154, 4096))
    base_cfg = dataclasses.replace(cfg, int8_mm=False)
    base = MMDiT(base_cfg, dtype=jnp.bfloat16)
    params = jax.jit(base.init)(jax.random.key(0), x, t, y, ctx)["params"]
    if int8:
        params = jax.jit(quantize_tree)(params)

    @jax.jit
    def denoise(params, xt, sigma):
        tt = jnp.broadcast_to(sigma * 1000.0, (2,))
        out = model.apply({"params": params}, xt, tt, y, ctx)
        den = xt - out * sigma
        pos, neg = jnp.split(den, 2, axis=0)
        return jnp.concatenate([neg + (pos - neg) * 5.0] * 2, axis=0)

    xt = jax.random.normal(jax.random.key(1), (2, 128, 128, 16))
    t0 = time.perf_counter()
    xt = denoise(params, xt, jnp.float32(1.0))
    float(jnp.sum(xt))
    print(f"[{'int8' if int8 else 'bf16'}] warmup+compile: "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        xt = denoise(params, xt, jnp.float32(1.0 - i * 0.02))
    float(jnp.sum(xt))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"[{'int8' if int8 else 'bf16'}] denoise step: {ms:.2f} ms",
          flush=True)
    return ms


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("int8", "both"):
        i8 = bench(True)
    if which in ("bf16", "both"):
        b16 = bench(False)
    if which == "both":
        print(f"speedup: {b16 / i8:.3f}x")
