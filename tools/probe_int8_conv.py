"""Probe int8 vs bf16 3x3 conv at SD1 UNet op points (NHWC, bs2=CFG)."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 50
DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


def loop_conv(x, w, acc):
    def body(i, carry):
        xx = x + carry[:1, :1, :1, :1].astype(x.dtype)
        return jax.lax.conv_general_dilated(
            xx, w, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=acc)
    b, h, wd, _ = x.shape
    return jax.lax.fori_loop(
        0, ITERS, body, jnp.zeros((b, h, wd, w.shape[-1]), acc))


def timed(fn, *args):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / ITERS


for b, hw, cin, cout in [(2, 64, 320, 320), (2, 32, 640, 640),
                         (2, 16, 1280, 1280), (2, 8, 1280, 1280)]:
    flops = 2 * b * hw * hw * 9 * cin * cout
    key = jax.random.key(0)
    x16 = jax.random.normal(key, (b, hw, hw, cin), jnp.bfloat16)
    w16 = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
    x8, w8 = (x16 * 8).astype(jnp.int8), (w16 * 8).astype(jnp.int8)
    f16 = jax.jit(lambda x, w: loop_conv(x, w, jnp.float32))
    f8 = jax.jit(lambda x, w: loop_conv(x, w, jnp.int32))
    dt16, dt8 = timed(f16, x16, w16), timed(f8, x8, w8)
    print(f"conv3x3 bs{b} {hw}² {cin}->{cout}: bf16 {dt16*1e3:6.3f} ms "
          f"({flops/dt16/1e12:6.1f} TF/s)  int8 {dt8*1e3:6.3f} ms "
          f"({flops/dt8/1e12:6.1f} TOP/s)  speedup {dt16/dt8:4.2f}x",
          flush=True)
