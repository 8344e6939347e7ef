"""Probe: base-2 softmax (exp2 + log2e folded into the q-side prescale).

Every ``exp`` on the VPU internally computes ``exp2(x * log2e)``; folding
log2(e) into the q-side scale makes the per-logit exponential a raw exp2
(1 of ~5 per-logit VPU ops at the per-logit-bound joint op point), and for
non-pow2 scales (SD1's d=40) it also kills the per-logit s*scale multiply.
This measures the SHIPPED kernels (base2 is default for bf16) against the
natural-exp path restored by monkeypatching ``_softmax_mode``.

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


def _natural_mode(dtype, scale, has_bias):
    if fa._is_pow2(scale):
        return scale, jnp.exp, False
    return None, jnp.exp, False


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

    if use_pos:
        t_b2 = bench_pos(q, k, v, z, scale)
    else:
        t_b2 = bench_fwd(q, k, v)
    orig = fa._softmax_mode
    fa._softmax_mode = _natural_mode
    try:
        if use_pos:
            t_nat = bench_pos(q, k, v, z, scale)
        else:
            t_nat = bench_fwd(q, k, v)
    finally:
        fa._softmax_mode = orig
    n_logits = 2 * h * L * L
    print(f"{tag}: natural {t_nat*1e3:.3f} ms -> base2 {t_b2*1e3:.3f} ms "
          f"[{t_nat/t_b2:.3f}x]  ({n_logits/t_b2/1e9:.0f} Glogits/s, "
          f"max|err| vs fp32 = {err:.3e})", flush=True)


if __name__ == "__main__":
    run("SD3 joint x*x (2,24,4096,64) pos-kernel", 64, 24, 64 ** -0.5, True)
    run("SD1 @64^2     (2, 8,4096,40) fwd-kernel", 40, 8, 40 ** -0.5, False)
