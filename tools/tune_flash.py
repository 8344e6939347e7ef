"""Block-size / layout sweep for the Pallas flash kernel on real op points.

SD1 UNet self-attention shapes: (B=2,H=8,L=4096,D=40) @64², (2,8,1024,80)
@32². MMDiT joint: (2,24,4250,64)-ish. Prints ms per call for each config.

Usage: python tools/tune_flash.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
    flash_attention)


def timeit(fn, q, k, v, iters=30):
    # The axon relay has ~ms per-dispatch latency and block_until_ready is
    # not an honest sync. Time ONE dispatch of a jitted on-device chain of
    # `iters` kernel calls (data-dependent, so none can be elided), synced
    # via a host float; subtract nothing — per-kernel cost = total/iters.
    @jax.jit
    def chain(q, k, v):
        def body(_, x):
            return fn(x, k, v)
        return jax.lax.fori_loop(0, iters, body, q)

    out = chain(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))  # warm + sync
    t0 = time.perf_counter()
    out = chain(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    shapes = [
        (2, 8, 4096, 40),    # SD1 @64² (×5 per step)
        (2, 8, 1024, 80),    # SD1 @32² (×5 per step)
        (2, 24, 4250, 64),   # MMDiT-ish joint seq
    ]
    blocks = [(1024, 1024), (512, 1024), (1024, 512), (512, 512),
              (2048, 1024), (1024, 2048), (256, 1024), (2048, 2048),
              (4096, 1024), (1024, 4096)]
    for (b, h, l, d) in shapes:
        key = jax.random.key(0)
        q, k, v = (jax.random.normal(jax.random.key(i), (b, h, l, d),
                                     jnp.bfloat16) for i in range(3))
        print(f"\n== shape B{b} H{h} L{l} D{d} ==")
        base = None
        for (bq, bk) in blocks:
            if bq > l + 127 or bk > l + 127:
                continue
            try:
                ms = timeit(
                    lambda q, k, v, bq=bq, bk=bk: flash_attention(
                        q, k, v, block_q=bq, block_k=bk), q, k, v)
            except Exception as e:  # noqa: BLE001
                print(f"  bq={bq:5d} bk={bk:5d}: FAIL {type(e).__name__}")
                continue
            tag = ""
            if base is None:
                base = ms
            else:
                tag = f"  ({ms / base:.2f}x)"
            print(f"  bq={bq:5d} bk={bk:5d}: {ms:7.3f} ms{tag}")


if __name__ == "__main__":
    main()
