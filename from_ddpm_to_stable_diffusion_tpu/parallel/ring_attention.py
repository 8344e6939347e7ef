"""Sequence-parallel attention over an ICI mesh axis: ring + Ulysses.

The reference has no long-context machinery (SURVEY.md §5); these are the
TPU-native mechanisms for scaling the MMDiT joint sequence (or video-length
token streams) past one chip:

- :func:`ring_attention` — K/V shards rotate around the mesh axis via
  ``jax.lax.ppermute`` inside ``shard_map``; each hop computes a partial
  flash attention of the local Q block against the visiting K/V block and
  merges it with a numerically-stable log-sum-exp accumulation. Compute and
  ICI transfer overlap across hops (XLA schedules the ppermute
  asynchronously against the local matmuls).
- :func:`ulysses_attention` — all-to-all re-shard seq→heads, one LOCAL full
  attention per device over the whole sequence with H/N heads, all-to-all
  back. One collective round instead of N−1 hops; needs heads % devices == 0.

Both are exact (not approximations) — verified against single-device
attention in tests on the fake 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SEQ_AXIS


def _attention_with_lse(q, k, v, scale, kv_mask=None):
    """XLA attention returning (out, lse) — the per-block primitive.

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


def _merge_partials(o1, lse1, o2, lse2):
    """Combine two attention partial sums with their log-sum-exps."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    out = (o1 * (w1 / denom)[..., None].astype(o1.dtype)
           + o2 * (w2 / denom)[..., None].astype(o2.dtype))
    return out, m + jnp.log(denom)


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


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mesh: Mesh, axis: str = SEQ_AXIS,
    scale: Optional[float] = None,
    kv_valid_len: Optional[int] = None,
    causal: bool = False,
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
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    l = k.shape[2]
    block = l // n
    spec = P(None, None, axis, None)
    pos_spec = P(axis)
    perm = [(j, (j + 1) % n) for j in range(n)]

    if causal:
        zz, inv = zigzag_order(l, n)
        q, k, v = q[:, :, zz], k[:, :, zz], v[:, :, zz]
        positions = zz.astype(jnp.int32)   # global position of each row
    else:
        positions = jnp.arange(l, dtype=jnp.int32)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec, pos_spec),
                       out_specs=spec)
    def inner(ql, kl, vl, posl):
        me = jax.lax.axis_index(axis)

        def kv_mask(kv_pos):
            """(Lq, Lk) or (Lk,) mask from the visiting block's global
            positions; None when nothing is masked."""
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

    out = inner(q, k, v, positions)
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
