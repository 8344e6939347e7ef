"""Probe: softmax exponential variants in the flash kernels.

Toggles ``flash_attention._softmax_mode`` and measures each arm:
  exp   — natural-exp online softmax (per-logit s*scale mul for non-pow2
          scales).  SHIPPED DEFAULT: measured fastest on v5e.
  fma   — natural exp with the non-pow2 scale folded into the exp
          argument (p = exp(s*c - m*c), one FMA) — no standalone mul.
  exp2  — base-2 rebasing (p = exp2(s*k2 - m*k2), k2 = c*log2e).
          Measured 0.921x (SD3 x*x) / 0.960x (SD1 @64^2): the VPU exp is
          NOT exp2-plus-multiply in disguise; rebasing is a dead end.

Run on the chip: python tools/probe_exp2.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import from_ddpm_to_stable_diffusion_tpu.ops.flash_attention as fa  # noqa: E402


def bench_pos(q, k, v, z, scale, iters=30):
    def loop(q, k, v):
        def body(i, carry):
            qq = q + carry[:, :, :1, :1].astype(q.dtype) * 0
            o, _ = fa.flash_attention_pos(qq, k, v, z, z, scale=scale)
            return o.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(q))

    f = jax.jit(loop)
    float(jnp.sum(f(q, k, v)))
    t0 = time.perf_counter()
    float(jnp.sum(f(q, k, v)))
    return (time.perf_counter() - t0) / iters


def bench_fwd(q, k, v, iters=30):
    def loop(q, k, v):
        def body(i, carry):
            qq = q + carry[:, :, :1, :1].astype(q.dtype) * 0
            o = fa.flash_attention(qq, k, v)
            return o.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(q))

    f = jax.jit(loop)
    float(jnp.sum(f(q, k, v)))
    t0 = time.perf_counter()
    float(jnp.sum(f(q, k, v)))
    return (time.perf_counter() - t0) / iters


def run(tag, d, h, scale, use_pos):
    L = 4096
    q, k, v = (jax.random.normal(jax.random.key(i), (2, h, L, d),
                                 jnp.bfloat16) for i in range(3))
    z = jnp.zeros((2,), jnp.int32)

    # accuracy vs an fp32 XLA oracle
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), vf)
    if use_pos:
        got, _ = fa.flash_attention_pos(q, k, v, z, z, scale=scale)
    else:
        got = fa.flash_attention(q, k, v)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))

    orig = fa._softmax_mode
    times = {}
    try:
        for mode in ("exp", "fma", "exp2"):
            fa._softmax_mode = mode
            times[mode] = (bench_pos(q, k, v, z, scale) if use_pos
                           else bench_fwd(q, k, v))
    finally:
        fa._softmax_mode = orig
    n_logits = 2 * h * L * L
    base = times["exp"]
    rel = "  ".join(f"{m} {t*1e3:.3f} ms [{base/t:.3f}x]"
                    for m, t in times.items())
    print(f"{tag}: {rel}  ({n_logits/base/1e9:.0f} Glogits/s on exp, "
          f"max|err| vs fp32 = {err:.3e})", flush=True)


if __name__ == "__main__":
    run("SD3 joint x*x (2,24,4096,64) pos-kernel", 64, 24, 64 ** -0.5, True)
    run("SD1 @64^2     (2, 8,4096,40) fwd-kernel", 40, 8, 40 ** -0.5, False)
