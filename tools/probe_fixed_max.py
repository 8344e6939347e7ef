"""Probe: bound the TOTAL cost of softmax stability machinery.

A kernel with a FIXED max (m = 0: p = exp(s) directly — no per-logit
max-reduce, no m scratch, no alpha rescale of the accumulator) is the
ceiling of every "coarser stability scheme": no online-softmax variant
can be faster.  Safe only when logits are bounded (e.g. qk-norm models);
measured here to decide whether a bounded-logit opt-in is worth shipping.
Denominator rides the PV matmul (MXU rowsum ones-column, d=64).

Run on the chip: python tools/probe_fixed_max.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (  # noqa: E402
    _cdiv, _is_pow2, _ld, _pad_to, _st, flash_attention_pos)


def _fwd_fixed_max(q_ref, k_ref, v_ref, o_ref, acc_ref,
                   *, scale, block_q, block_k, n_k, d, no_exp=False):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    prescale = _is_pow2(scale)

    qt = _ld(q_ref, block_q, d)
    s = jax.lax.dot_general(
        qt * jnp.asarray(scale, qt.dtype) if prescale else qt,
        _ld(k_ref, block_k, d),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    if not prescale:
        s = s * scale
    p = s if no_exp else jnp.exp(s)      # fixed m = 0: no max, no alpha
    v_aug = jnp.concatenate(
        [_ld(v_ref, block_k, d), jnp.ones((block_k, 1), v_ref.dtype)],
        axis=-1)
    acc_ref[:] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_aug, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(ik == n_k - 1)
    def _finalize():
        l = acc_ref[:, d:d + 1]
        _st(o_ref, acc_ref[:, :d] / jnp.where(l == 0.0, 1.0, l))


def flash_fixed_max(q, k, v, *, scale, block_q=1024, block_k=1024,
                    no_exp=False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q = min(block_q, _cdiv(lq, 128) * 128)
    block_k = min(block_k, _cdiv(lk, 128) * 128)
    qp = _pad_to(q.reshape(b * h, lq, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, lk, d), 1, block_k)
    vp = _pad_to(v.reshape(b * h, lk, d), 1, block_k)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    n_q, n_k = lq_p // block_q, lk_p // block_k
    out = pl.pallas_call(
        functools.partial(_fwd_fixed_max, scale=scale, block_q=block_q,
                          block_k=block_k, n_k=n_k, d=d, no_exp=no_exp),
        grid=(b * h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d + 1), jnp.float32)],
    )(qp, kp, vp)
    return out[:, :lq].reshape(b, h, lq, d)


def bench(fn, q, k, v, iters=30):
    def loop(q, k, v):
        def body(i, carry):
            qq = q + carry[:, :, :1, :1].astype(q.dtype) * 0
            return fn(qq, k, v).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(q))

    f = jax.jit(loop)
    float(jnp.sum(f(q, k, v)))
    best = float("inf")
    for _ in range(5):          # min-of-5: the relay sync adds jitter
        t0 = time.perf_counter()
        float(jnp.sum(f(q, k, v)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


if __name__ == "__main__":
    L, H, D = 4096, 24, 64
    scale = D ** -0.5
    q, k, v = (jax.random.normal(jax.random.key(i), (2, H, L, D),
                                 jnp.bfloat16) * 0.5 for i in range(3))
    z = jnp.zeros((2,), jnp.int32)

    o0, _ = flash_attention_pos(q, k, v, z, z, scale=scale)
    o1 = flash_fixed_max(q, k, v, scale=scale)
    err = float(jnp.max(jnp.abs(o0.astype(jnp.float32)
                                - o1.astype(jnp.float32))))
    print(f"max |Δout| vs shipped online-softmax = {err:.3e}", flush=True)

    n_logits = 2 * H * L * L
    t0 = bench(lambda a, b, c:
               flash_attention_pos(a, b, c, z, z, scale=scale)[0], q, k, v)
    print(f"shipped (online softmax) : {t0*1e3:.3f} ms "
          f"({n_logits/t0/1e9:.0f} Glogits/s)", flush=True)
    t1 = bench(lambda a, b, c: flash_fixed_max(a, b, c, scale=scale),
               q, k, v)
    print(f"fixed-max (ceiling)      : {t1*1e3:.3f} ms "
          f"({n_logits/t1/1e9:.0f} Glogits/s)  [{t0/t1:.3f}x]", flush=True)
    t2 = bench(lambda a, b, c:
               flash_fixed_max(a, b, c, scale=scale, no_exp=True), q, k, v)
    print(f"no-exp (matmuls+convert) : {t2*1e3:.3f} ms "
          f"({n_logits/t2/1e9:.0f} Glogits/s)  [{t0/t2:.3f}x]", flush=True)
