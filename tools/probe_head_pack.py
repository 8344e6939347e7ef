"""Probe: can head packing beat the d→128-padded MXU floor?  (No.)

VERDICT r4 asked for a packed-heads attention kernel at SD1's d=40/80
(3×40=120 lanes, block-diagonal qk^T).  The FLOP identity says it can't
win: a single matmul producing all H heads' logits must be block-diagonal
in one operand, and its M·N·K = Lq·(H·Lk)·128pad — exactly H separate
d-padded matmuls.  The padding is burned either way; packing only
relocates it from the contraction lanes to block-diagonal zeros.

This measures that identity on the MXU: H separate (L×d)@(d×L) matmuls
vs one (L×(H·d_pad))@((H·d_pad)×(H·L)) block-diagonal matmul at SD1's
@64² shape.  The recoverable cost is the ~33% ABOVE the padded floor
(online-softmax machinery + block boundaries), addressed instead by the
single-pass whole-KV kernel — tools/probe_wide_fwd.py.

Run on the chip: python tools/probe_head_pack.py
"""

import time

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
        kbd = jax.lax.fori_loop(
            0, h_pack, lambda h, acc: acc.at[h, :, h * d:(h + 1) * d].set(
                k[h]), kbd)
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
