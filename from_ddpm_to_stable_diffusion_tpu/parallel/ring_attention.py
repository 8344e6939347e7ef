"""Sequence-parallel attention over an ICI mesh axis: ring + Ulysses.

The reference has no long-context machinery (SURVEY.md §5); these are the
TPU-native mechanisms for scaling the MMDiT joint sequence (or video-length
token streams) past one chip:

- :func:`ring_attention` — K/V shards rotate around the mesh axis via
  ``jax.lax.ppermute`` inside ``shard_map``; each hop computes a partial
  FLASH attention (the Pallas online-softmax kernel with global-position
  masking, ``ops.flash_attention.flash_attention_pos``) of the local Q block
  against the visiting K/V block and merges it with a numerically-stable
  log-sum-exp accumulation.  Per-hop memory is O(block_q·block_k) in VMEM —
  logits are never materialized — so total memory is O(L·D) per device, the
  true blockwise/ring-attention algorithm.  Compute and ICI transfer overlap
  across hops (XLA schedules the ppermute asynchronously against the local
  kernels).  Backward is a custom VJP: the global lse + delta are computed
  once, then K/V *and their gradient accumulators* rotate a full lap while
  each device adds its Pallas-kernel contribution (``flash_bwd_pos``).
- :func:`ulysses_attention` — all-to-all re-shard seq→heads, one LOCAL full
  attention per device over the whole sequence with H/N heads, all-to-all
  back. One collective round instead of N−1 hops; needs heads % devices == 0.

Both are exact (not approximations) — verified against single-device
attention in tests on the fake 8-device CPU mesh.  ``impl="xla"`` keeps the
previous materialized-logits path (used on CPU where Pallas would run in
interpret mode; also the numerics oracle in tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import flash_attention_pos, flash_bwd_pos
from .mesh import SEQ_AXIS


def _attention_with_lse(q, k, v, scale, kv_mask=None):
    """XLA attention returning (out, lse) — materialized-logits primitive.

    ``kv_mask``: optional (Lk,) or (Lq, Lk) bool; masked-out keys
    contribute nothing (fully-masked blocks yield lse = −inf and a zero
    partial, which the log-sum-exp merge ignores; fully-masked ROWS yield
    a zero partial with lse = −inf that a later unmasked block replaces).
    """
    precision = (jax.lax.Precision.HIGHEST
                 if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=precision) * scale
    if kv_mask is not None:
        mask = (kv_mask[None, None, None, :] if kv_mask.ndim == 1
                else kv_mask[None, None, :, :])
        logits = jnp.where(mask, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    out = jnp.einsum("bhqk,bhkd->bhqd", (p / safe_l).astype(v.dtype), v,
                     precision=precision)
    lse = (m + jnp.log(safe_l))[..., 0]  # (B, H, Lq)
    return out, lse


from ..ops.flash_attention import (  # noqa: E402 — canonical lse merge
    merge_attention_partials as _merge_partials)


def zigzag_order(l: int, n: int):
    """Global seq permutation for causal-balanced ring attention.

    Splits [0, l) into 2n chunks and assigns device i the pair
    (chunk_i, chunk_{2n-1-i}) — every device then owns an equal share of
    early AND late positions, so the causal mask admits the same amount of
    work per device on every hop (a contiguous layout leaves device 0
    nearly idle while device n-1 computes a full block; the ring is
    lockstep, so everyone waits for the worst device).

    Returns (perm, inv) index arrays: ``x[..., perm, :]`` produces the
    zig-zag layout; ``out[..., inv, :]`` restores natural order.
    """
    assert l % (2 * n) == 0, f"seq {l} must divide into 2*{n} chunks"
    half = l // (2 * n)
    chunks = [jnp.arange(i * half, (i + 1) * half) for i in range(2 * n)]
    perm = jnp.concatenate(
        [jnp.concatenate([chunks[i], chunks[2 * n - 1 - i]])
         for i in range(n)])
    inv = jnp.argsort(perm)
    return perm, inv


def _chunk_offsets(src, *, causal, n, half, l_local):
    """(2,) int32 global segment offsets of device ``src``'s local block.

    Causal zig-zag layout: device s holds chunks (s, 2n-1-s), each of
    length ``half``.  Contiguous layout: one segment at s·l_local (the
    second offset is never selected because seg = l_local).
    """
    src = src.astype(jnp.int32)
    if causal:
        return jnp.stack([src * half, (2 * n - 1 - src) * half])
    return jnp.stack([src * l_local, jnp.zeros_like(src)])


def _ring_fwd_impl(q, k, v, mesh, axis, scale, kv_valid_len, causal,
                   block_q, block_k, interpret):
    """Flash-primitive ring forward on ZIG-ZAG/NATURAL-layout inputs.

    Returns (out, lse) in the same layout as the inputs.
    """
    n = mesh.shape[axis]
    l = k.shape[2]
    l_local = l // n
    half = l // (2 * n) if causal else l_local
    seg = half if causal else l_local
    spec = P(None, None, axis, None)
    perm = [(j, (j + 1) % n) for j in range(n)]
    offs = functools.partial(_chunk_offsets, causal=causal, n=n, half=half,
                             l_local=l_local)
    attn = functools.partial(
        flash_attention_pos, causal=causal, scale=scale, seg_q=seg,
        seg_k=seg, valid_len=kv_valid_len, block_q=block_q, block_k=block_k,
        interpret=interpret)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes info
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=(spec, P(None, None, axis)),
                       check_vma=False)
    def inner(ql, kl, vl):
        me = jax.lax.axis_index(axis)
        qoff = offs(me)
        out, lse = attn(ql, kl, vl, qoff, qoff)

        def hop(carry, h):
            out, lse, kb, vb = carry
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            o2, l2 = attn(ql, kb, vb, qoff, offs((me - h) % n))
            out, lse = _merge_partials(out, lse, o2, l2)
            return (out, lse, kb, vb), None

        (out, lse, _, _), _ = jax.lax.scan(
            hop, (out, lse, kl, vl), jnp.arange(1, n))
        return out, lse

    return inner(q, k, v)


def _ring_bwd_impl(q, k, v, out, lse, g, mesh, axis, scale, kv_valid_len,
                   causal, block_q, block_k, interpret):
    """Ring backward: rotate (k, v, dk, dv) one full lap; each device adds
    its Pallas flash-backward contribution for the visiting block under the
    GLOBAL softmax (lse from the merged forward)."""
    n = mesh.shape[axis]
    l = k.shape[2]
    l_local = l // n
    half = l // (2 * n) if causal else l_local
    seg = half if causal else l_local
    spec = P(None, None, axis, None)
    lspec = P(None, None, axis)
    perm = [(j, (j + 1) % n) for j in range(n)]
    offs = functools.partial(_chunk_offsets, causal=causal, n=n, half=half,
                             l_local=l_local)
    bwd = functools.partial(
        flash_bwd_pos, causal=causal, scale=scale, seg_q=seg, seg_k=seg,
        valid_len=kv_valid_len, block_q=block_q, block_k=block_k,
        interpret=interpret)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, lspec, spec),
        out_specs=(spec, spec, spec), check_vma=False)
    def inner(ql, kl, vl, outl, lsel, gl):
        me = jax.lax.axis_index(axis)
        qoff = offs(me)
        delta = jnp.sum(gl.astype(jnp.float32) * outl.astype(jnp.float32),
                        axis=-1)  # (B, H, Lq_local) fp32

        def hop(carry, h):
            dq, kb, vb, dkb, dvb = carry
            dq_c, dk_c, dv_c = bwd(ql, kb, vb, gl, lsel, delta,
                                   qoff, offs((me - h) % n))
            # fp32 accumulators: n bf16 adds would lose mantissa bits (the
            # dk/dv accumulators do ride the ICI at 2× width for bf16 —
            # correctness over traffic here).
            dq = dq + dq_c.astype(jnp.float32)
            dkb = dkb + dk_c.astype(jnp.float32)
            dvb = dvb + dv_c.astype(jnp.float32)
            # rotate the block AND its gradient accumulator together; after
            # n (compute, rotate) iterations both are back home with every
            # device's contribution summed in.
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            dkb = jax.lax.ppermute(dkb, axis, perm)
            dvb = jax.lax.ppermute(dvb, axis, perm)
            return (dq, kb, vb, dkb, dvb), None

        zeros = functools.partial(jnp.zeros_like, dtype=jnp.float32)
        (dq, _, _, dk, dv), _ = jax.lax.scan(
            hop, (zeros(ql), kl, vl, zeros(kl), zeros(vl)), jnp.arange(n))
        return (dq.astype(ql.dtype), dk.astype(kl.dtype),
                dv.astype(vl.dtype))

    return inner(q, k, v, out, lse, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _ring_attention_flash(q, k, v, mesh, axis, scale, kv_valid_len, causal,
                          blocks, interpret):
    out, _ = _ring_fwd_impl(q, k, v, mesh, axis, scale, kv_valid_len,
                            causal, blocks[0], blocks[1], interpret)
    return out


def _ring_flash_vjp_fwd(q, k, v, mesh, axis, scale, kv_valid_len, causal,
                        blocks, interpret):
    out, lse = _ring_fwd_impl(q, k, v, mesh, axis, scale, kv_valid_len,
                              causal, blocks[0], blocks[1], interpret)
    return out, (q, k, v, out, lse)


def _ring_flash_vjp_bwd(mesh, axis, scale, kv_valid_len, causal, blocks,
                        interpret, res, g):
    q, k, v, out, lse = res
    dq, dk, dv = _ring_bwd_impl(q, k, v, out, lse, g, mesh, axis, scale,
                                kv_valid_len, causal, blocks[0], blocks[1],
                                interpret)
    return dq, dk, dv


_ring_attention_flash.defvjp(_ring_flash_vjp_fwd, _ring_flash_vjp_bwd)


def _ring_attention_xla(q, k, v, mesh, axis, scale, kv_valid_len, causal,
                        positions):
    """Materialized-logits ring (CPU fallback / numerics oracle)."""
    n = mesh.shape[axis]
    l = k.shape[2]
    spec = P(None, None, axis, None)
    pos_spec = P(axis)
    perm = [(j, (j + 1) % n) for j in range(n)]

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec, pos_spec),
                       out_specs=spec)
    def inner(ql, kl, vl, posl):
        def kv_mask(kv_pos):
            valid = None
            if kv_valid_len is not None and kv_valid_len != l:
                valid = kv_pos < kv_valid_len
            if causal:
                m = kv_pos[None, :] <= posl[:, None]
                return m if valid is None else m & valid[None, :]
            return valid

        out, lse = _attention_with_lse(ql, kl, vl, scale, kv_mask(posl))

        def hop(carry, _):
            out, lse, kb, vb, pb = carry
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            pb = jax.lax.ppermute(pb, axis, perm)
            o2, l2 = _attention_with_lse(ql, kb, vb, scale, kv_mask(pb))
            out, lse = _merge_partials(out, lse, o2, l2)
            return (out, lse, kb, vb, pb), None

        (out, lse, _, _, _), _ = jax.lax.scan(
            hop, (out, lse, kl, vl, posl), jnp.arange(n - 1))
        return out

    return inner(q, k, v, positions)


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mesh: Mesh, axis: str = SEQ_AXIS,
    scale: Optional[float] = None,
    kv_valid_len: Optional[int] = None,
    causal: bool = False,
    impl: Optional[str] = None,
    block_q: int = 1024, block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Exact attention with q/k/v sharded on seq over ``axis`` of ``mesh``.

    q, k, v: (B, H, L, D) global arrays (sharded or to-be-sharded on L);
    L must be a multiple of the axis size — pad and pass ``kv_valid_len``
    for ragged sequences (padded keys are masked by global position;
    padded query rows produce garbage the caller slices off).

    ``causal=True`` additionally masks kv positions above the query's
    global position AND re-lays the sequence out in zig-zag order
    internally (:func:`zigzag_order`) so the triangular work is balanced
    across devices; inputs and output stay in natural order. Requires
    L % (2·axis_size) == 0.

    ``impl``: "flash" (Pallas per-hop kernels, O(L·D) device memory,
    custom-VJP backward — the default on TPU) or "xla" (materialized
    per-hop logits — the default off-TPU, where Pallas would interpret).
    ``interpret=True`` forces the flash path through the Pallas
    interpreter (CPU testing).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl is None:
        impl = "flash" if (interpret or jax.default_backend() == "tpu") \
            else "xla"
    n = mesh.shape[axis]
    l = k.shape[2]

    if causal:
        zz, inv = zigzag_order(l, n)
        q, k, v = q[:, :, zz], k[:, :, zz], v[:, :, zz]

    if impl == "flash":
        out = _ring_attention_flash(q, k, v, mesh, axis, scale,
                                    kv_valid_len, causal,
                                    (block_q, block_k), interpret)
    elif impl == "xla":
        positions = (zz if causal else jnp.arange(l)).astype(jnp.int32)
        out = _ring_attention_xla(q, k, v, mesh, axis, scale, kv_valid_len,
                                  causal, positions)
    else:
        raise ValueError(f"unknown ring impl {impl!r}")

    if causal:
        out = out[:, :, inv]
    return out


def ulysses_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mesh: Mesh, axis: str = SEQ_AXIS,
    scale: Optional[float] = None,
    kv_valid_len: Optional[int] = None,
) -> jax.Array:
    """Exact attention via all-to-all head↔sequence re-sharding.

    ``kv_valid_len``: for padded (ragged) sequences — keys at global
    position ≥ valid_len are masked out (padded QUERY rows still produce
    garbage the caller slices off, same contract as ring_attention).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    h = q.shape[1]
    l = k.shape[2]
    assert h % n == 0, f"heads {h} must divide over axis size {n}"
    spec = P(None, None, axis, None)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    def inner(ql, kl, vl):
        # local: (B, H, L/n, D) → all_to_all → (B, H/n, L, D)
        a2a = functools.partial(jax.lax.all_to_all, axis_name=axis,
                                split_axis=1, concat_axis=2, tiled=True)
        qh, kh, vh = a2a(ql), a2a(kl), a2a(vl)
        mask = None
        if kv_valid_len is not None and kv_valid_len != l:
            mask = jnp.arange(l) < kv_valid_len  # full L is local post-a2a
        out, _ = _attention_with_lse(qh, kh, vh, scale, mask)
        # back: (B, H/n, L, D) → (B, H, L/n, D)
        return jax.lax.all_to_all(out, axis_name=axis, split_axis=2,
                                  concat_axis=1, tiled=True)

    return inner(q, k, v)
