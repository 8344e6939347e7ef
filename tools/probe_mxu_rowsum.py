"""Probe: fold the softmax rowsum into the PV matmul (MXU rowsum).

The per-logit softmax budget (exp + running-max + rowsum + convert) is the
VPU floor of the joint-attention op point (docs/KERNELS.md). Idea: append
a ones-column to the V tile IN VMEM — the (block_q, d+1) accumulator then
carries PV in columns [:d] and the softmax denominator in column d from
the SAME matmul. For d=64 the lane padding to 128 makes the extra column
free on the MXU, the l scratch and its 128-lane broadcast write disappear,
and the alpha-rescale covers l automatically. Accuracy: the denominator is
now computed from the SAME bf16-rounded p as the numerator (consistent —
the fp32 VPU rowsum summed fp32 p while the MXU numerator used bf16 p).

Run on the chip: python tools/probe_mxu_rowsum.py [L]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (  # noqa: E402
    NEG_INF, _cdiv, _is_pow2, _ld, _pad_to, _pos_mask, _pos_run, _st,
    flash_attention_pos)


def _fwd_kernel_pos_mxu(q_ref, k_ref, v_ref, qoff_ref, koff_ref, o_ref,
                        lse_ref, acc_ref, m_ref,
                        *, scale, causal, valid_len, seg_q, seg_k,
                        lq_actual, lk_actual, block_q, block_k, n_k, d):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)

    q_start = pl.program_id(1) * block_q
    k_start = ik * block_k
    run = _pos_run(q_start, k_start, qoff_ref, koff_ref, causal=causal,
                   valid_len=valid_len, seg_q=seg_q, seg_k=seg_k,
                   lq_actual=lq_actual, lk_actual=lk_actual,
                   block_q=block_q, block_k=block_k)
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    no_mask = (not causal and valid_len is None
               and lk_actual % block_k == 0)
    prescale = _is_pow2(scale)

    @pl.when(run)
    def _compute():
        qt = _ld(q_ref, block_q, d)
        s = jax.lax.dot_general(
            qt * jnp.asarray(scale, qt.dtype) if prescale else qt,
            _ld(k_ref, block_k, d),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if not prescale:
            s = s * scale
        if not no_mask:
            mask = _pos_mask(q_start, k_start, qoff_ref, koff_ref,
                             causal=causal, valid_len=valid_len, seg_q=seg_q,
                             seg_k=seg_k, lk_actual=lk_actual,
                             block_q=block_q, block_k=block_k)
            s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        v_aug = jnp.concatenate(
            [_ld(v_ref, block_k, d),
             jnp.ones((block_k, 1), v_ref.dtype)], axis=-1)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_aug,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ik == n_k - 1)
    def _finalize():
        l = acc_ref[:, d:d + 1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        _st(o_ref, acc_ref[:, :d] / safe_l)
        _st(lse_ref, m_ref[:, :1] + jnp.log(safe_l))


def flash_pos_mxu(q, k, v, q_offsets, kv_offsets, *, causal=False,
                  scale=None, seg_q=None, seg_k=None, valid_len=None,
                  block_q=1024, block_k=1024, interpret=False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    seg_q = lq if seg_q is None else seg_q
    seg_k = lk if seg_k is None else seg_k
    block_q = min(block_q, _cdiv(lq, 128) * 128)
    block_k = min(block_k, _cdiv(lk, 128) * 128)
    qp = _pad_to(q.reshape(b * h, lq, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, lk, d), 1, block_k)
    vp = _pad_to(v.reshape(b * h, lk, d), 1, block_k)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    n_q, n_k = lq_p // block_q, lk_p // block_k

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_pos_mxu, scale=scale, causal=causal,
            valid_len=valid_len, seg_q=seg_q, seg_k=seg_k, lq_actual=lq,
            lk_actual=lk, block_q=block_q, block_k=block_k, n_k=n_k, d=d),
        grid=(b * h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, ik: (bh, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lq_p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d + 1), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, q_offsets.astype(jnp.int32), kv_offsets.astype(jnp.int32))
    out = out[:, :lq].reshape(b, h, lq, d)
    lse = lse[:, :lq, 0].reshape(b, h, lq)
    return out, lse


def bench(fn, q, k, v, z, iters=30):
    def loop(q, k, v):
        def body(i, carry):
            qq = q + carry[:, :, :1, :1].astype(q.dtype) * 0
            o, lse = fn(qq, k, v, z, z, scale=64 ** -0.5)
            return o.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(q))

    f = jax.jit(loop)
    float(jnp.sum(f(q, k, v)))
    t0 = time.perf_counter()
    float(jnp.sum(f(q, k, v)))
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    q, k, v = (jax.random.normal(jax.random.key(i), (2, 24, L, 64),
                                 jnp.bfloat16) for i in range(3))
    z = jnp.zeros((2,), jnp.int32)

    o0, l0 = flash_attention_pos(q, k, v, z, z, scale=64 ** -0.5)
    o1, l1 = flash_pos_mxu(q, k, v, z, z, scale=64 ** -0.5)
    do = float(jnp.max(jnp.abs(o0.astype(jnp.float32)
                               - o1.astype(jnp.float32))))
    dl = float(jnp.max(jnp.abs(l0 - l1)))
    print(f"max |Δout| = {do:.3e}   max |Δlse| = {dl:.3e}", flush=True)

    n_logits = 2 * 24 * L * L
    t0 = bench(flash_attention_pos, q, k, v, z)
    print(f"baseline  L={L}: {t0*1e3:.3f} ms ({n_logits/t0/1e9:.0f} "
          f"Glogits/s)", flush=True)
    t1 = bench(flash_pos_mxu, q, k, v, z)
    print(f"mxu-rowsum L={L}: {t1*1e3:.3f} ms ({n_logits/t1/1e9:.0f} "
          f"Glogits/s)  [{t0/t1:.3f}x]", flush=True)
