"""Probe: can head packing beat the d→128-padded MXU floor?  (No.)

VERDICT r4 asked for a packed-heads attention kernel at SD1's d=40/80
(3×40=120 lanes, block-diagonal qk^T).  The FLOP identity: packing H
heads lane-concatenates q to (L, H·d) and block-diagonalizes k to
(H·L, H·d), so the single matmul's M·N·K = L·(H·L)·(H·d) vs H separate
d→128-padded matmuls' H·L·L·128 — a ratio of H·d/128 (0.94 at 3×40),
i.e. FLOP-neutral, while the softmax becomes per-head-segmented.

Measured on-chip (v5e, 2026-08-19), XLA arms:
  L=4096 d=40 H=3: separate 1.580 ms, packed 1.018 ms [1.55x], floor 0.065
  L=1024 d=80 H=2: separate 1.101 ms, packed 0.714 ms [1.54x], floor 0.003
The 1.55x is real but says nothing about the Pallas kernel: BOTH XLA
arms run >=15x above the padded floor (sub-ms ops, relay dispatch +
batched-matmul layout copies dominate); the separate arm additionally
pays XLA's batch-dim tiling of the (H, L, L) fp32 output.  The shipped
flash kernel already runs the whole attention (both matmuls + softmax)
at 1.04 ms device @64² = 1.5x the padded floor — faster than either
XLA arm's QK^T alone — and a packed-head kernel's best case is the
0.94x FLOP ratio on the matmul portion (~0.03 ms/kernel, ~0.2 ms/step)
for per-head segmented online-softmax complexity.  Dead end confirmed.
The recoverable cost above the floor is per-logit VPU work, measured
separately by tools/probe_wide_fwd.py (single-pass exact softmax ==
online kernel at the @64² op point -> the m/l carry is NOT the cost).

Run on the chip: python tools/probe_head_pack.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(fn, *args, iters=50):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def run(l, d, h_pack):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((h_pack, l, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((h_pack, l, d)), jnp.bfloat16)

    # arm 1: H separate per-head QK^T (batched dot_general; each pads
    # the d-lane contraction to 128)
    sep = jax.jit(lambda q, k: jnp.einsum(
        "hld,hmd->hlm", q, k, preferred_element_type=jnp.float32))

    # arm 2: one block-diagonal matmul — q heads lane-concatenated
    # (L, H·d), k block-diagonalized ((H·L), (H·d)); the single matmul's
    # contraction is H·d ≥ 128 lanes "useful", but N grew H×
    def packed(q, k):
        qp = q.transpose(1, 0, 2).reshape(l, h_pack * d)
        kbd = jnp.zeros((h_pack, l, h_pack * d), k.dtype)
        for hh in range(h_pack):   # h_pack <= 3: unroll, static slices
            kbd = kbd.at[hh, :, hh * d:(hh + 1) * d].set(k[hh])
        kbd = kbd.reshape(h_pack * l, h_pack * d)
        s = jnp.einsum("lc,mc->lm", qp, kbd,
                       preferred_element_type=jnp.float32)
        return s.reshape(l, h_pack, l).transpose(1, 0, 2)

    packed_j = jax.jit(packed)
    a, b = sep(q, k), packed_j(q, k)
    err = float(jnp.max(jnp.abs(a - b)))

    t_sep = bench(sep, q, k)
    t_packed = bench(packed_j, q, k)
    floor = 2 * h_pack * l * l * 128 / 197e12
    print(f"L={l} d={d} H={h_pack}: separate {t_sep*1e3:.3f} ms "
          f"(floor {floor*1e3:.3f}), block-diag packed {t_packed*1e3:.3f} ms "
          f"[{t_sep/t_packed:.3f}x]  max|err|={err:.1e}", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    run(4096, 40, 3)   # SD1 @64² heads, 3 packed -> 120 lanes
    run(1024, 80, 2)   # SD1 @32² heads, 2 packed -> 160 lanes
