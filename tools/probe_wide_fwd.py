"""Probe: single-pass whole-KV forward kernel vs the online flash kernel.

The SD1 step profile (docs/SD1_STEP_PROFILE.md) attributes 5.7 of 19.7
device ms to the flash kernels, with the @64² kernels at 67% of the
d→128-padded MXU floor — the gap being online-softmax bookkeeping (m/l
carry, per-k-step acc rescale) and k-block boundaries.  At SD1's shapes
the whole K/V per (b, h) is ≤1.3 MB, so `_flash_fwd_wide` computes each
q tile's FULL logit row in one matmul and applies one exact softmax.
This measures both paths at the shipped op points.

Run on the chip: python tools/probe_wide_fwd.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import from_ddpm_to_stable_diffusion_tpu.ops.flash_attention as fa  # noqa: E402


def bench(fn, *args, iters=30):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def run(tag, b, h, l, d):
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    scale = d ** -0.5

    want = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                      k.astype(jnp.float32)) * scale
    want = jax.nn.softmax(want, -1) @ v.astype(jnp.float32)

    wide_fn = jax.jit(lambda q, k, v: fa._flash_fwd_wide(q, k, v, scale)[0])
    got = wide_fn(q, k, v)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))

    t_wide = bench(wide_fn, q, k, v)

    orig = fa._wide_enabled
    fa._wide_enabled = False
    try:
        online_fn = jax.jit(functools.partial(fa.flash_attention,
                                              scale=scale))
        t_online = bench(online_fn, q, k, v)
    finally:
        fa._wide_enabled = orig

    floor = 2 * 2 * b * h * l * l * 128 / 197e12  # padded MXU floor, s
    print(f"{tag}: online {t_online*1e3:.3f} ms -> wide {t_wide*1e3:.3f} ms "
          f"[{t_online/t_wide:.3f}x]  (padded floor {floor*1e3:.3f} ms, "
          f"wide at {floor/t_wide*100:.0f}%; max|err| vs fp32 = {err:.2e})",
          flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    run("SD1 @64² (2,8,4096,40)", 2, 8, 4096, 40)
    run("SD1 @32² (2,8,1024,80)", 2, 8, 1024, 80)
    run("SD3 x*x  (2,24,4096,64)", 2, 24, 4096, 64)
