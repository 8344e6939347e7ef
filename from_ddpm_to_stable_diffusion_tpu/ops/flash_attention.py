"""Pallas TPU flash attention with a memory-bounded custom VJP.

The framework's hot kernel: replaces materialized (Lq, Lk) logits with an
online-softmax accumulation over key blocks held in VMEM, so HBM traffic is
O(L·D) instead of O(L²). Covers every attention in the model zoo: UNet/VAE
spatial self-attention (4096 tokens at 64²), MMDiT joint attention
(154+4096 tokens), cross attention, causal CLIP text, and T5 with additive
relative-position bias.

Layout: q (B, H, Lq, D), k/v (B, H, Lk, D); optional additive ``bias``
broadcastable to (B, H, Lq, Lk); optional ``segment_ids`` (q_ids (B, Lq),
kv_ids (B, Lk)) masking attention to same-segment pairs (packed sequences;
per-example ragged lengths via a pad id no real token uses). Logits/softmax
accumulate in fp32; inputs may be bf16. Sequence lengths are padded to
block multiples in the wrapper; padded keys are masked inside the kernel by
global column index.

Backward: forward saves only (out, lse) — the flash residual contract —
then two recompute-based Pallas kernels produce dq (key-block inner loop)
and dk/dv (query-block inner loop); with bias the dq kernel also emits
dbias (= dlogits) tiles, reduced over broadcast dims in the wrapper.  The
XLA-scanned recompute remains only as the non-TPU compiled fallback.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634

# Softmax exponential mode for the bf16 forward kernels (measured on a
# v5e, tools/probe_exp2.py — the winner "exp" is the default):
#   "exp":  natural-exp online softmax, per-logit s·scale multiply for
#           non-pow2 scales.  MEASURED FASTEST: the VPU exponential is
#           not exp2-plus-multiply in disguise, so rebasing buys nothing.
#   "exp2": rebased base-2 softmax — p = exp2(s·k2 − m·k2), k2 =
#           c_rem·log2(e); for NON-pow2 scales with no bias (SD1's
#           d=40/80) the scale folds into k2.  Measured 0.921x at the SD3
#           x×x op point and 0.960x at SD1 @64² — exp2 lowering costs
#           more than the multiply it saves.  Kept as a togglable probe
#           arm (ADVICE r4: the probe must really toggle the kernels).
#   "fma":  natural exp with the non-pow2 scale folded into the exp
#           argument (p = exp(s·c − m·c), one FMA) — kills the
#           standalone per-logit multiply without touching exp.
# fp32 inputs and bias'd logits always take the plain "exp" path.
_softmax_mode = "exp"


def _resolve_softmax(dtype, has_bias):
    if dtype != jnp.bfloat16 or has_bias:
        return "exp"
    return _softmax_mode


def _is_pow2(x: float) -> bool:
    """Exact power of two? Then multiplying any float by it is lossless
    (exponent shift), so the softmax scale can be folded into the q TILE
    — (block_q, d) multiplies instead of (block_q, block_k) per-logit ones
    (~1 of ~5 VPU ops at per-logit-bound op points). head_dim 16/64/256
    give pow2 scales; SD1's d=40 does not and keeps the per-logit path.
    """
    import math

    m, _ = math.frexp(x)
    return m == 0.5


def _cdiv(a, b):
    return -(-a // b)


def _ld(ref, rows, cols):
    """Load a block and reshape away unit dims to (rows, cols).

    Makes the kernels layout-agnostic: BHLD blocks are (1, rows, cols),
    BLHD blocks are (1, rows, 1, cols) — the kernel math is identical.
    """
    return ref[...].reshape(rows, cols)


def _st(ref, val):
    """Store a (rows, cols) value into a block with extra unit dims."""
    ref[...] = val.reshape(ref.shape).astype(ref.dtype)


def _seg_mask(qseg_ref, kvseg_ref, block_q, block_k):
    """(block_q, block_k) same-segment mask from the packed-sequence id
    blocks: q ids (block_q, 1), kv ids (1, block_k) — jax flash layout."""
    q_ids = qseg_ref[0]            # (block_q, 1)
    kv_ids = kvseg_ref[0, :1, :]   # (1, block_k)
    return jnp.broadcast_to(q_ids == kv_ids, (block_q, block_k))


def _vma_of(*xs):
    """Union of the varying-mesh-axes of traced inputs (empty outside
    shard_map). Under a partial-manual ``jax.shard_map`` with
    ``check_vma=True`` (e.g. parallel/pipeline.py's 1F1B over the 'stage'
    axis, which keeps other axes auto so TP composes), every pallas_call
    must DECLARE how its outputs vary — out_shapes carry ``vma=`` derived
    from the inputs, since the kernels are elementwise-per-shard in the
    mesh sense."""
    vma = set()
    for x in xs:
        if x is None:
            continue
        v = getattr(jax.typeof(x), "vma", None)
        if v:
            vma |= set(v)
    return frozenset(vma)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, qseg_ref, kvseg_ref,
                qb_ref, kb_ref, lo_ref, hi_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref=None,
                *, scale, causal, lk_actual, block_q, block_k, n_k, d, h,
                remap, mxu_rowsum=False, smode="exp"):
    iq = pl.program_id(q_ref.ndim - 2)      # grid (..., n_q, n_k)
    ik_grid = pl.program_id(q_ref.ndim - 1)

    @pl.when(ik_grid == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        if not mxu_rowsum:
            l_ref[:] = jnp.zeros_like(l_ref)

    # Skip key blocks that are entirely padding, (when causal) blocks
    # strictly above the diagonal, and (when packed) blocks whose
    # segment-id ranges are disjoint (block-sparse packing skip).
    # Under ``remap`` (static seg_max_kv_blocks hint) the truncated k grid
    # walks each q block's live range [lo, hi] instead of [0, n_k): the
    # REAL k-block index is lo+ik (clamped for the DMA), and steps past hi
    # are gated off so the clamped re-fetch of block hi never double-counts.
    ik, in_range = ik_grid, True
    if remap:
        ib = pl.program_id(0) // h
        ik = lo_ref[ib, iq] + ik_grid
        in_range = ik <= hi_ref[ib, iq]
    q_start = iq * block_q
    k_start = ik * block_k
    run = jnp.logical_and(in_range, k_start < lk_actual)
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if qb_ref is not None:
        run = jnp.logical_and(
            run, _seg_block_run(qb_ref, kb_ref, pl.program_id(0) // h,
                                iq, ik))

    # fp32 inputs ask for true fp32 math (parity/tests); bf16 rides the MXU.
    mxu_precision = (jax.lax.Precision.HIGHEST
                     if q_ref.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    prescale = _is_pow2(scale)
    no_mask = (not causal and qseg_ref is None
               and lk_actual % block_k == 0)
    # "exp2"/"fma" + non-pow2 scale: keep s in the RAW qk domain (order
    # is preserved, scale > 0) and fold the scale into the exponential's
    # coefficient — no standalone per-logit multiply (requires no bias:
    # bias adds in the scaled domain)
    fold = smode in ("exp2", "fma") and not prescale and bias_ref is None
    rebase = smode == "exp2"
    c_rem = scale if fold else 1.0      # remaining scale in the s domain
    k2 = c_rem * (LOG2E if rebase else 1.0)
    efn = jnp.exp2 if rebase else jnp.exp

    @pl.when(run)
    def _compute():
        # Feed the MXU in the input dtype (bf16 native pass); accumulate and
        # run the softmax in fp32 via preferred_element_type.
        qt = _ld(q_ref, block_q, d)
        s = jax.lax.dot_general(
            qt * jnp.asarray(scale, qt.dtype) if prescale else qt,
            _ld(k_ref, block_k, d),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision)
        if not prescale and not fold:
            s = s * scale
        if bias_ref is not None:
            s = s + _ld(bias_ref, block_q, block_k).astype(jnp.float32)
        if not no_mask:
            col = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = col < lk_actual
            if causal:
                row = q_start + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                mask = jnp.logical_and(mask, col <= row)
            if qseg_ref is not None:
                mask = jnp.logical_and(
                    mask, _seg_mask(qseg_ref, kvseg_ref, block_q, block_k))
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        if rebase or fold:
            alpha = efn((m_prev - m_new) * k2)
            p = efn(s * k2 - m_new * k2)   # per-logit FMA + exp/exp2
        else:
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
        vt = _ld(v_ref, block_k, d)
        if mxu_rowsum:
            # MXU rowsum: a ones-column appended to the V tile makes the
            # SAME matmul emit the softmax denominator in acc column d —
            # the VPU rowsum, the l scratch, and its 128-lane broadcast
            # write all disappear (free lanes: d % 128 != 0, so the
            # accumulator was padding to the same tile anyway). Measured
            # 1.11x at the 4096² joint op point (tools/probe_mxu_rowsum.py).
            vt = jnp.concatenate(
                [vt, jnp.ones((block_k, 1), vt.dtype)], axis=-1)
        else:
            l_ref[:] = jnp.broadcast_to(
                l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
                l_ref.shape)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), vt,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ik_grid == n_k - 1)
    def _finalize():
        l = acc_ref[:, d:d + 1] if mxu_rowsum else l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        _st(o_ref, acc_ref[:, :d] / safe_l)
        # lse block is (block_q, 1): the bwd kernels consume this layout
        # directly, and a 128-lane broadcast would write 128x the bytes.
        # Under ``fold`` m lives in the raw qk domain: rescale here.
        _st(lse_ref, m_ref[:, :1] * c_rem + jnp.log(safe_l))


def _fwd_kernel_wide(q_ref, k_ref, v_ref, o_ref, lse_ref,
                     *, scale, lk_actual, lk_p, d, mxu_rowsum):
    """Single-pass forward: the WHOLE K/V for this (b, h) sits in VMEM, so
    one q tile computes its full logit row in ONE matmul, takes the EXACT
    row max, and applies softmax + PV with zero online-stability machinery
    (no m/l carry, no acc rescale, no k-grid revisits).

    Why this and not "head packing": at small head dims (SD1's d=40/80)
    the MXU pads the contraction/output lanes to 128 — and any single
    matmul producing all H heads' logits needs M·N·K ≥ Lq·(H·Lk)·128pad,
    identical to H separate padded matmuls (block-diagonal operands burn
    exactly the lanes they save; measured in tools/probe_head_pack.py).
    The padded matmul floor is therefore a hardware constant; what IS
    recoverable is the ~33% overhead ABOVE that floor (online-softmax
    bookkeeping + k-block boundaries — docs/SD1_STEP_PROFILE.md), which
    this kernel removes for shapes whose K/V fit in VMEM.
    """
    s = jax.lax.dot_general(
        _ld(q_ref, q_ref.shape[-2], d),
        _ld(k_ref, lk_p, d),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT))
    if not _is_pow2(scale):      # pow2 scales are folded into q host-side
        s = s * scale
    if lk_actual != lk_p:        # zero-padded K rows must not join softmax
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < lk_actual, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)     # exact max — no carry
    p = jnp.exp(s - m)
    vt = _ld(v_ref, lk_p, d)
    if mxu_rowsum:
        vt = jnp.concatenate([vt, jnp.ones((lk_p, 1), vt.dtype)], axis=-1)
        acc = jax.lax.dot_general(
            p.astype(vt.dtype), vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        l = acc[:, d:d + 1]
        o = acc[:, :d]
    else:
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vt.dtype), vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    _st(o_ref, o / safe_l)
    _st(lse_ref, m + jnp.log(safe_l))


# Single-pass threshold: whole-K/V VMEM bytes (k + v bf16, double-buffered
# by Mosaic) the wide path may spend.  4096×128 bf16 k+v = 2 MiB ×2 buffers
# leaves >10 MiB for the fp32 logit row at block_q ≤ 512.
_WIDE_KV_BYTES = 4 * 1024 * 1024
_WIDE_MIN_LQ = 2048    # measured (tools/probe_wide_fwd.py, v5e): wide is
#   0.675× at (2,8,1024,80) — the shrunken block_q starves the DMA pipeline
#   at short sequences — vs 1.008×/1.028× at the lq=4096 op points.
_wide_enabled = True   # probe/test hook


def _wide_eligible(lq, lk, d, dtype, has_bias, has_seg, causal):
    if not _wide_enabled or has_bias or has_seg or causal:
        return False
    if d > 128 or lq < _WIDE_MIN_LQ:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    lk_p = _cdiv(lk, 128) * 128
    return 2 * lk_p * max(d, 128) * itemsize <= _WIDE_KV_BYTES


def _flash_fwd_wide(q, k, v, scale, interpret=False):
    """(out (B,H,Lq,D), lse (B,H,Lq) fp32) via the single-pass kernel."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if _is_pow2(scale):
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # lossless
    # fp32 logit row (block_q, lk_p) + its bf16 cast dominate VMEM; budget
    # ~6 MiB for them -> block_q 512 up to lk 2048, 256 at lk 4096.
    lk_p = _cdiv(lk, 128) * 128
    block_q = max(128, min(512, (6 * 2 ** 20) // (6 * lk_p) // 128 * 128))
    block_q = min(block_q, _cdiv(lq, 128) * 128)
    qp = _pad_to(q.reshape(b * h, lq, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, lk, d), 1, 128)
    vp = _pad_to(v.reshape(b * h, lk, d), 1, 128)
    n_q = qp.shape[1] // block_q
    mxu_rowsum = (d % 128) != 0
    vma = _vma_of(q, k, v)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_wide, scale=scale, lk_actual=lk,
                          lk_p=lk_p, d=d, mxu_rowsum=mxu_rowsum),
        grid=(b * h, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, lk_p, d), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, lk_p, d), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq: (bh, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, qp.shape[1], d), q.dtype, vma=vma),
            jax.ShapeDtypeStruct((b * h, qp.shape[1], 1), jnp.float32,
                                 vma=vma),
        ],
        interpret=interpret)(qp, kp, vp)
    out = out[:, :lq].reshape(b, h, lq, d)
    lse = lse[:, :lq, 0].reshape(b, h, lq)
    return out, lse


def _occupancy_block_q(block_q: int, lq: int) -> int:
    """Halve a whole-sequence q block so the grid has ≥2 q programs.

    Measured (v5e, tools/tune_flash.py): at (2, 8, 1024, 80) — the SD1
    @32² shape — block_q 512 runs 0.97 ms vs 1.59 ms for a single
    1024-row block: more grid steps pipeline the k/v DMA against compute.
    Shapes with multiple q blocks already (e.g. 4096 @64²) are untouched.
    """
    if block_q >= lq and lq >= 512:
        return _cdiv(block_q // 2, 128) * 128
    return block_q


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = _cdiv(size, mult) * mult - size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _seg_inputs(segment_ids, b, h, lq, lk, block_q, block_k):
    """Pack (q_ids (B,Lq), kv_ids (B,Lk)) into kernel-friendly layouts:
    q → (B, Lq_p, 1), kv → (B, 8, Lk_p) (jax flash-attention layout; the
    8-sublane broadcast makes the kv row-vector a legal VMEM tile).
    Padding id −1 never matches a valid (≥0) segment id.

    Also emits per-block [min, max] id bounds — (B, n_q, 2) / (B, n_k, 2)
    int32 in SMEM — so the kernels can SKIP (q block, k block) pairs whose
    id ranges are disjoint (block-sparsity of packed layouts): with sorted
    packing, only near-diagonal blocks run, making kernel time O(Σ len_i²)
    instead of O(L²)."""
    q_ids, kv_ids = segment_ids
    q_pad = jnp.pad(q_ids.astype(jnp.int32),
                    ((0, 0), (0, _cdiv(lq, block_q) * block_q - lq)),
                    constant_values=-1)
    kv_pad = jnp.pad(kv_ids.astype(jnp.int32),
                     ((0, 0), (0, _cdiv(lk, block_k) * block_k - lk)),
                     constant_values=-1)
    q_blocks = q_pad.reshape(b, -1, block_q)
    kv_blocks = kv_pad.reshape(b, -1, block_k)
    q_bounds = jnp.stack([q_blocks.min(2), q_blocks.max(2)], axis=-1)
    kv_bounds = jnp.stack([kv_blocks.min(2), kv_blocks.max(2)], axis=-1)
    kv_bcast = jnp.broadcast_to(kv_pad[:, None, :], (b, 8, kv_pad.shape[1]))
    return [q_pad[:, :, None], kv_bcast, q_bounds, kv_bounds]


def _seg_block_run(qb_ref, kb_ref, ib, iq, ik):
    """Scalar skip test: do this q block's and k block's segment-id ranges
    overlap at all?  Conservative (range overlap ⊇ any-equal-pair), exact
    for the sorted packed layouts the wrappers produce."""
    return jnp.logical_and(qb_ref[ib, iq, 0] <= kb_ref[ib, ik, 1],
                           kb_ref[ib, ik, 0] <= qb_ref[ib, iq, 1])


def _seg_block_ranges(q_bounds, kv_bounds):
    """First/last overlapping block index along the OTHER axis, per block:
    (q_lo, q_hi) each (B, n_q) over k blocks, and (k_lo, k_hi) each
    (B, n_k) over q blocks.  Drives the scalar-prefetch index maps that
    clamp skipped blocks' DMA onto the nearest live block (consecutive
    identical block indices → Mosaic elides the copy), so packed layouts
    skip the HBM traffic as well as the MXU work.  Blocks with no overlap
    at all get [0, 0] — their compute is still gated off by
    _seg_block_run, the spurious fetch of block 0 is harmless."""
    overlap = jnp.logical_and(
        q_bounds[:, :, None, 0] <= kv_bounds[:, None, :, 1],
        kv_bounds[:, None, :, 0] <= q_bounds[:, :, None, 1])  # (B, n_q, n_k)

    def ranges(ov):           # first/last True along the last axis
        n = ov.shape[-1]
        any_ = ov.any(-1)
        lo = jnp.where(any_, jnp.argmax(ov, -1), 0)
        hi = jnp.where(any_, n - 1 - jnp.argmax(ov[..., ::-1], -1), 0)
        return lo.astype(jnp.int32), hi.astype(jnp.int32)

    q_lo, q_hi = ranges(overlap)
    k_lo, k_hi = ranges(jnp.swapaxes(overlap, 1, 2))
    return q_lo, q_hi, k_lo, k_hi


def _check_seg_hint(q_lo, q_hi, grid_extent, segment_ids,
                    axis="k blocks per q block"):
    """When the segment ids are concrete (not traced), verify the static
    seg_max_kv_blocks hint actually covers every block's live range —
    an undersized hint would silently drop attention mass."""
    if any(isinstance(x, jax.core.Tracer) for x in (q_lo, q_hi)):
        return
    needed = int(jnp.max(q_hi - q_lo + 1))
    if grid_extent < needed:
        raise ValueError(
            f"truncated grid extent {grid_extent} < {needed} required by "
            f"this packing layout (max overlapping {axis}); raise "
            "seg_max_kv_blocks")


def _seg_grid_extents(hint, n_q, n_k, block_q, block_k):
    """(dq-side, dkv-side) truncated grid extents from the user hint.

    The hint bounds *k blocks overlapped per q block*.  The dkv kernel's
    inner grid iterates q blocks per k block — for ``block_q == block_k``
    (self-attention packing, where q and kv share one layout) the overlap
    matrix is symmetric so the same bound holds; for unequal block sizes
    convert via positions: a q block sharing a segment with k block ``ik``
    has its (contiguous, sorted-packing) k span inside
    ``[ik-hint+1, ik+hint-1]`` k blocks, i.e. a ``(2*hint-1)*block_k``
    position window, which ``ceil(.../block_q)+1`` q blocks intersect.
    Over-estimates only cost clamped (DMA-elided) grid steps."""
    hint = int(hint)
    if block_q == block_k:
        nq_side = hint
    else:
        nq_side = _cdiv((2 * hint - 1) * block_k, block_q) + 1
    return min(n_k, hint), min(n_q, nq_side)


def _flash_fwd(q, k, v, bias, segment_ids, causal, scale, block_q, block_k,
               interpret=False, seg_max_kv_blocks=None):
    """Returns (out (B,H,Lq,D), lse (B,H,Lq) fp32).

    head_dim stays UNPADDED in HBM: Mosaic lane-pads the (block, d) tiles
    in VMEM for free, while a 128-pad in HBM costs a materialized copy of
    q/k/v AND 128/d× the kernel's k/v read traffic.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if _wide_eligible(lq, lk, d, q.dtype, bias is not None,
                      segment_ids is not None, causal):
        return _flash_fwd_wide(q, k, v, scale, interpret)
    # block_q=2048 measures ~10% faster standalone at (2,8,4096,40) but
    # fails to compile inside the full SD1 UNet program on the v5e
    # remote-compile service; 1024 is the safe default everywhere.
    # WIDE heads (the 512-wide single-head VAE attention) scale the tiles
    # down: 1024-row blocks at d=512 need ~18 MB of scoped VMEM (q/k/v +
    # fp32 acc + logits + double buffering) — over the 16 MB limit
    # (observed as a Mosaic stack OOM in the SD3 VAE decoder at batch 4).
    if d > 256:
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
    block_q = min(block_q, _cdiv(lq, 128) * 128)
    block_k = min(block_k, _cdiv(lk, 128) * 128)
    block_q = _occupancy_block_q(block_q, lq)
    has_bias = bias is not None
    has_seg = segment_ids is not None

    qp = _pad_to(q.reshape(b * h, lq, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, lk, d), 1, block_k)
    vp = _pad_to(v.reshape(b * h, lk, d), 1, block_k)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    n_q, n_k = lq_p // block_q, lk_p // block_k
    grid_nk = n_k
    remap = False
    if has_seg and seg_max_kv_blocks is not None:
        if has_bias:
            raise ValueError(
                "seg_max_kv_blocks with bias is unsupported (dbias tiles "
                "outside the truncated grid would stay unwritten)")
        grid_nk = min(n_k, int(seg_max_kv_blocks))
        remap = grid_nk < n_k
    grid = (b * h, n_q, grid_nk)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda bh, iq, ik: (bh, iq, 0)),
    ]
    vma = _vma_of(q, k, v, bias)
    out_shape = [
        jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype, vma=vma),
        jax.ShapeDtypeStruct((b * h, lq_p, 1), jnp.float32, vma=vma),
    ]

    args = [qp, kp, vp]
    scalar_args = []
    if has_seg:
        # Scalar-prefetch DMA skip: clamp each (q block)'s k/v (and bias /
        # kv-id) fetches onto its overlapping k-block range [lo, hi] —
        # consecutive identical block indices elide the copy, so skipped
        # blocks cost neither MXU nor HBM traffic.  Compute outside the
        # range is gated off by _seg_block_run against the TRUE (unclamped)
        # bounds, so clamped garbage blocks are never read.  Under
        # ``remap`` the grid itself is truncated to seg_max_kv_blocks steps
        # and step ik fetches REAL block min(lo+ik, hi) — grid time drops
        # from O(n_q·n_k) to O(n_q·hint).
        if remap:
            def _kv_blk(bh, iq, ik, lo_ref, hi_ref, h=h):
                return jnp.minimum(lo_ref[bh // h, iq] + ik,
                                   hi_ref[bh // h, iq])
        else:
            def _kv_blk(bh, iq, ik, lo_ref, hi_ref, h=h):
                return jnp.clip(ik, lo_ref[bh // h, iq],
                                hi_ref[bh // h, iq])

        in_specs = [
            pl.BlockSpec((1, block_q, d),
                         lambda bh, iq, ik, lo, hi: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, iq, ik, lo, hi:
                         (bh, _kv_blk(bh, iq, ik, lo, hi), 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, iq, ik, lo, hi:
                         (bh, _kv_blk(bh, iq, ik, lo, hi), 0)),
        ]
        out_specs = [
            pl.BlockSpec((1, block_q, d),
                         lambda bh, iq, ik, lo, hi: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1),
                         lambda bh, iq, ik, lo, hi: (bh, iq, 0)),
        ]
    if has_bias:
        bias_b = jnp.broadcast_to(bias, (b, h, lq, lk)).reshape(b * h, lq, lk)
        bias_b = _pad_to(_pad_to(bias_b, 1, block_q), 2, block_k)
        if has_seg:
            in_specs.append(pl.BlockSpec(
                (1, block_q, block_k),
                lambda bh, iq, ik, lo, hi:
                (bh, iq, _kv_blk(bh, iq, ik, lo, hi))))
        else:
            in_specs.append(pl.BlockSpec((1, block_q, block_k),
                                         lambda bh, iq, ik: (bh, iq, ik)))
        args.append(bias_b)
    if has_seg:
        seg_args = _seg_inputs(segment_ids, b, h, lq, lk,
                                block_q, block_k)
        args += seg_args
        in_specs += [
            pl.BlockSpec((1, block_q, 1),
                         lambda bh, iq, ik, lo, hi, h=h: (bh // h, iq, 0)),
            pl.BlockSpec((1, 8, block_k),
                         lambda bh, iq, ik, lo, hi, h=h:
                         (bh // h, 0, _kv_blk(bh, iq, ik, lo, hi))),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        q_lo, q_hi, _, _ = _seg_block_ranges(seg_args[2], seg_args[3])
        if remap:
            _check_seg_hint(q_lo, q_hi, grid_nk, segment_ids)
        scalar_args = [q_lo, q_hi]

    # MXU rowsum rides free only when d leaves padded lanes spare
    # (d % 128 != 0); at exact multiples (e.g. the 512-wide VAE single
    # head) the +1 column would grow the accumulator tile by a full
    # 128-lane step, so those keep the VPU rowsum.
    mxu_rowsum = (d % 128) != 0
    body = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, lk_actual=lk,
        block_q=block_q, block_k=block_k, n_k=grid_nk, d=d, h=h,
        remap=remap, mxu_rowsum=mxu_rowsum,
        smode=_resolve_softmax(q.dtype, has_bias))

    def kernel(*refs):
        sc = refs[:2 * has_seg]             # lo/hi scalar refs (seg only)
        refs = refs[2 * has_seg:]
        in_refs = list(refs[:3 + has_bias + 4 * has_seg])
        rest = refs[3 + has_bias + 4 * has_seg:]
        qkv = in_refs[:3]
        bias_r = in_refs[3] if has_bias else None
        seg_rs = in_refs[3 + has_bias:] if has_seg else [None] * 4
        lo_hi = sc if has_seg else (None, None)
        body(*qkv, bias_r, *seg_rs, *lo_hi, *rest)

    scratch = [
        pltpu.VMEM((block_q, d + 1 if mxu_rowsum else d), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
    ]
    if not mxu_rowsum:
        scratch.append(pltpu.VMEM((block_q, 128), jnp.float32))
    if has_seg:
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=grid, in_specs=in_specs,
                out_specs=out_specs, scratch_shapes=scratch),
            out_shape=out_shape, interpret=interpret)
    else:
        call = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=scratch,
            interpret=interpret)
    out, lse = call(*scalar_args, *args)
    out = out[:, :lq].reshape(b, h, lq, d)
    lse = lse[:, :lq, 0].reshape(b, h, lq)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def flash_attention(q, k, v, bias=None, segment_ids=None,
                    causal: bool = False,
                    scale: Optional[float] = None,
                    block_q: int = 1024, block_k: int = 1024,
                    interpret: bool = False,
                    seg_max_kv_blocks: Optional[int] = None):
    """Flash attention over (B, H, L, D); returns (B, H, Lq, D).

    ``segment_ids``: optional (q_ids (B, Lq), kv_ids (B, Lk)) int pair for
    packed sequences — attention is masked to same-segment pairs, composing
    with ``causal`` and ``bias``.  Per-example ragged lengths are the
    special case "pad tokens get an id no real token uses".

    ``seg_max_kv_blocks``: STATIC upper bound on how many k blocks any one
    q block's segments can overlap (for sorted packing of sequences up to
    ``max_len``: ceil(max_len/block_k) + 1).  Truncates the kernel grid to
    that many k steps per q block, making packed attention time
    O(L·max_len) instead of O(L²).  The backward dkv grid needs the
    transposed bound (q blocks per k block) — equal to the hint when
    ``block_q == block_k`` (self-attention packing has a symmetric block
    overlap matrix), derived conservatively from it otherwise
    (``_seg_grid_extents``).  Both bounds are validated against the actual
    layout when segment_ids are concrete; under jit the caller's hint is
    trusted — an undersized hint drops attention mass / gradient mass.
    Incompatible with ``bias``.
    """
    out, _ = _flash_fwd(q, k, v, bias, segment_ids, causal,
                        q.shape[-1] ** -0.5 if scale is None else scale,
                        block_q, block_k, interpret, seg_max_kv_blocks)
    return out


def _vjp_fwd(q, k, v, bias, segment_ids, causal, scale, block_q, block_k,
             interpret, seg_max_kv_blocks):
    out, lse = _flash_fwd(q, k, v, bias, segment_ids, causal,
                          q.shape[-1] ** -0.5 if scale is None else scale,
                          block_q, block_k, interpret, seg_max_kv_blocks)
    return out, (q, k, v, bias, segment_ids, out, lse)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                   bias_ref, qseg_ref, kvseg_ref, qb_ref, kb_ref,
                   lo_ref, hi_ref, dq_ref, dbias_ref, acc_ref,
                   *, scale, causal, lk_actual, block_q, block_k, n_k, h,
                   remap):
    iq = pl.program_id(1)
    ik_grid = pl.program_id(2)

    @pl.when(ik_grid == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ik, in_range = ik_grid, True
    if remap:   # truncated k grid walks [lo, hi] (see _fwd_kernel)
        ib = pl.program_id(0) // h
        ik = lo_ref[ib, iq] + ik_grid
        in_range = ik <= hi_ref[ib, iq]
    q_start = iq * block_q
    k_start = ik * block_k
    run = jnp.logical_and(in_range, k_start < lk_actual)
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if qb_ref is not None:
        run = jnp.logical_and(
            run, _seg_block_run(qb_ref, kb_ref, pl.program_id(0) // h,
                                iq, ik))
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    prescale = _is_pow2(scale)
    no_mask = (not causal and qseg_ref is None
               and lk_actual % block_k == 0)

    @pl.when(run)
    def _():
        qt = q_ref[0]
        s = jax.lax.dot_general(
            qt * jnp.asarray(scale, qt.dtype) if prescale else qt,
            k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if not prescale:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        lse = lse_ref[0]  # (block_q, 1)
        if no_mask:
            p = jnp.exp(s - lse)  # padded q rows: lse=+inf -> p=0
        else:
            col = k_start + jax.lax.broadcasted_iota(jnp.int32,
                                                     (block_q, block_k), 1)
            mask = col < lk_actual
            if causal:
                row = q_start + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                mask = jnp.logical_and(mask, col <= row)
            if qseg_ref is not None:
                mask = jnp.logical_and(
                    mask, _seg_mask(qseg_ref, kvseg_ref, block_q, block_k))
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            g_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        delta = delta_ref[0]  # (block_q, 1)
        ds = p * (dp - delta)
        if dbias_ref is not None:
            # dlogits = ds; bias adds to logits unscaled -> dbias = ds
            dbias_ref[0] = ds.astype(dbias_ref.dtype)
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    if dbias_ref is not None:
        # every (iq, ik) tile is written exactly once — zero skipped ones
        @pl.when(jnp.logical_not(run))
        def _zero_skipped_dbias():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    @pl.when(ik_grid == n_k - 1)
    def _fin():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                    bias_ref, qseg_ref, kvseg_ref, qb_ref, kb_ref,
                    lo_ref, hi_ref, dk_ref, dv_ref, acc_dk, acc_dv,
                    *, scale, causal, block_q, block_k, n_q, h, remap):
    ik = pl.program_id(1)
    iq_grid = pl.program_id(2)

    @pl.when(iq_grid == 0)
    def _init():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    iq, in_range = iq_grid, True
    if remap:   # truncated q grid walks this k block's live range [lo, hi]
        ib = pl.program_id(0) // h
        iq = lo_ref[ib, ik] + iq_grid
        in_range = iq <= hi_ref[ib, ik]
    q_start = iq * block_q
    k_start = ik * block_k
    # causal: a q block contributes only if its last row reaches this k block
    run = (q_start + block_q - 1 >= k_start) if causal else True
    if qb_ref is not None:
        seg_run = _seg_block_run(qb_ref, kb_ref, pl.program_id(0) // h,
                                 iq, ik)
        run = jnp.logical_and(run, seg_run) if causal else seg_run
    if remap:
        run = jnp.logical_and(run, in_range)
    gated = causal or qb_ref is not None
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    prescale = _is_pow2(scale)

    @pl.when(run if gated else True)
    def _():
        qt = q_ref[0]
        s = jax.lax.dot_general(
            qt * jnp.asarray(scale, qt.dtype) if prescale else qt,
            k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if not prescale:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        # padded q rows carry lse=+inf -> p=0; padded k cols are sliced off
        lse = lse_ref[0]  # (block_q, 1)
        p = jnp.exp(s - lse)
        if causal:
            row = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            p = jnp.where(col <= row, p, 0.0)
        if qseg_ref is not None:
            p = jnp.where(_seg_mask(qseg_ref, kvseg_ref, block_q, block_k),
                          p, 0.0)
        acc_dv[:] += jax.lax.dot_general(
            p.astype(g_ref.dtype), g_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dp = jax.lax.dot_general(
            g_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        delta = delta_ref[0]  # (block_q, 1)
        ds = p * (dp - delta)
        acc_dk[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    @pl.when(iq_grid == n_q - 1)
    def _fin():
        dk_ref[0] = (acc_dk[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[:].astype(dv_ref.dtype)


def _flash_bwd_pallas(q, k, v, bias, segment_ids, out, lse, g, causal,
                      scale, block_q, block_k, interpret,
                      seg_max_kv_blocks=None):
    """Pallas two-kernel flash backward; with ``bias`` the dq kernel also
    emits dbias tiles (dlogits), reduced over broadcast dims here."""
    b, h, lq, d_orig = q.shape
    lk = k.shape[2]
    if d_orig > 256:   # wide heads: keep scoped VMEM under 16 MB (see fwd)
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
    block_q = min(block_q, _cdiv(lq, 128) * 128)
    block_k = min(block_k, _cdiv(lk, 128) * 128)
    block_q = _occupancy_block_q(block_q, lq)
    has_bias = bias is not None
    has_seg = segment_ids is not None
    # unpadded head_dim in HBM (see _flash_fwd)
    qp = _pad_to(q.reshape(b * h, lq, d_orig), 1, block_q)
    kp = _pad_to(k.reshape(b * h, lk, d_orig), 1, block_k)
    vp = _pad_to(v.reshape(b * h, lk, d_orig), 1, block_k)
    gp = _pad_to(g.reshape(b * h, lq, d_orig), 1, block_q)
    d = d_orig
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    n_q, n_k = lq_p // block_q, lk_p // block_k

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(b * h, lq, 1)
    lse_p = jnp.pad(lse.reshape(b * h, lq, 1),
                    ((0, 0), (0, lq_p - lq), (0, 0)),
                    constant_values=1e30)  # padded rows -> p = 0
    delta_p = _pad_to(delta, 1, block_q)

    remap = False
    grid_nk_dq, grid_nq_dkv = n_k, n_q
    if has_seg and seg_max_kv_blocks is not None:
        if has_bias:
            raise ValueError(
                "seg_max_kv_blocks with bias is unsupported (dbias tiles "
                "outside the truncated grid would stay unwritten)")
        grid_nk_dq, grid_nq_dkv = _seg_grid_extents(
            seg_max_kv_blocks, n_q, n_k, block_q, block_k)
        remap = grid_nk_dq < n_k or grid_nq_dkv < n_q

    def sig(f):
        """Index maps take two trailing scalar-ref args in the seg
        (prefetch) case; most maps ignore them."""
        return (lambda b_, i1, i2, lo, hi: f(b_, i1, i2)) if has_seg else f

    if has_seg:
        if remap:
            def _other_blk(b_, i_self, i_other, lo_ref, hi_ref, h=h):
                return jnp.minimum(lo_ref[b_ // h, i_self] + i_other,
                                   hi_ref[b_ // h, i_self])
        else:
            def _other_blk(b_, i_self, i_other, lo_ref, hi_ref, h=h):
                return jnp.clip(i_other, lo_ref[b_ // h, i_self],
                                hi_ref[b_ // h, i_self])

    extra_args = []
    extra_dq_specs = []
    extra_dkv_specs = []
    if has_bias:
        bias_b = jnp.broadcast_to(bias, (b, h, lq, lk)).reshape(b * h, lq, lk)
        bias_b = _pad_to(_pad_to(bias_b, 1, block_q), 2, block_k)
        extra_args.append(bias_b)
        if has_seg:
            extra_dq_specs.append(pl.BlockSpec(
                (1, block_q, block_k),
                lambda bh, iq, ik, lo, hi:
                (bh, iq, _other_blk(bh, iq, ik, lo, hi))))
            extra_dkv_specs.append(pl.BlockSpec(
                (1, block_q, block_k),
                lambda bh, ik, iq, lo, hi:
                (bh, _other_blk(bh, ik, iq, lo, hi), ik)))
        else:
            extra_dq_specs.append(pl.BlockSpec(
                (1, block_q, block_k), lambda bh, iq, ik: (bh, iq, ik)))
            extra_dkv_specs.append(pl.BlockSpec(
                (1, block_q, block_k), lambda bh, ik, iq: (bh, iq, ik)))
    scalar_dq, scalar_dkv = [], []
    if has_seg:
        seg_args = _seg_inputs(segment_ids, b, h, lq, lk,
                                block_q, block_k)
        extra_args += seg_args
        q_lo, q_hi, k_lo, k_hi = _seg_block_ranges(seg_args[2], seg_args[3])
        if remap:
            _check_seg_hint(q_lo, q_hi, grid_nk_dq, segment_ids)
            _check_seg_hint(k_lo, k_hi, grid_nq_dkv, segment_ids,
                            axis="q blocks per k block")
        scalar_dq, scalar_dkv = [q_lo, q_hi], [k_lo, k_hi]
        extra_dq_specs += [
            pl.BlockSpec((1, block_q, 1),
                         lambda bh, iq, ik, lo, hi, h=h: (bh // h, iq, 0)),
            pl.BlockSpec((1, 8, block_k),
                         lambda bh, iq, ik, lo, hi, h=h:
                         (bh // h, 0, _other_blk(bh, iq, ik, lo, hi))),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        extra_dkv_specs += [
            pl.BlockSpec((1, block_q, 1),
                         lambda bh, ik, iq, lo, hi, h=h:
                         (bh // h, _other_blk(bh, ik, iq, lo, hi), 0)),
            pl.BlockSpec((1, 8, block_k),
                         lambda bh, ik, iq, lo, hi, h=h: (bh // h, 0, ik)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]

    def wrap(body, n_in, dbias_slot):
        """Map the packed pallas refs onto the kernel's explicit
        (…, bias_ref, qseg, kvseg, qb, kb, lo, hi, outs…, scratch…)
        signature."""
        def kernel(*refs):
            sc = refs[:2 * has_seg]
            refs = refs[2 * has_seg:]
            ins = list(refs[:n_in + has_bias + 4 * has_seg])
            rest = list(refs[n_in + has_bias + 4 * has_seg:])
            base = ins[:n_in]
            bias_r = ins[n_in] if has_bias else None
            seg_rs = ins[n_in + has_bias:] if has_seg else [None] * 4
            lo_hi = sc if has_seg else (None, None)
            if dbias_slot and not has_bias:
                rest = [rest[0], None] + rest[1:]   # dq kernel, no dbias
            body(*base, bias_r, *seg_rs, *lo_hi, *rest)
        return kernel

    def call(kernel, grid, in_specs, out_specs, out_shape, scratch):
        if has_seg:
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2, grid=grid, in_specs=in_specs,
                    out_specs=out_specs, scratch_shapes=scratch),
                out_shape=out_shape, interpret=interpret)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=scratch,
            interpret=interpret)

    dq_out_specs = [pl.BlockSpec((1, block_q, d),
                                 sig(lambda bh, iq, ik: (bh, iq, 0)))]
    vma = _vma_of(q, k, v, g)
    dq_out_shape = [jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype,
                                         vma=vma)]
    if has_bias:
        dq_out_specs.append(pl.BlockSpec(
            (1, block_q, block_k), sig(lambda bh, iq, ik: (bh, iq, ik))))
        dq_out_shape.append(
            jax.ShapeDtypeStruct((b * h, lq_p, lk_p), jnp.float32,
                                 vma=vma))

    dq_in_specs = [
        pl.BlockSpec((1, block_q, d), sig(lambda bh, iq, ik: (bh, iq, 0))),
        pl.BlockSpec((1, block_k, d),
                     (lambda bh, iq, ik, lo, hi:
                      (bh, _other_blk(bh, iq, ik, lo, hi), 0)) if has_seg
                     else (lambda bh, iq, ik: (bh, ik, 0))),
        pl.BlockSpec((1, block_k, d),
                     (lambda bh, iq, ik, lo, hi:
                      (bh, _other_blk(bh, iq, ik, lo, hi), 0)) if has_seg
                     else (lambda bh, iq, ik: (bh, ik, 0))),
        pl.BlockSpec((1, block_q, d), sig(lambda bh, iq, ik: (bh, iq, 0))),
        pl.BlockSpec((1, block_q, 1), sig(lambda bh, iq, ik: (bh, iq, 0))),
        pl.BlockSpec((1, block_q, 1), sig(lambda bh, iq, ik: (bh, iq, 0))),
    ] + extra_dq_specs

    dq_res = call(
        wrap(functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                               lk_actual=lk, block_q=block_q,
                               block_k=block_k, n_k=grid_nk_dq, h=h,
                               remap=remap), 6, True),
        (b * h, n_q, grid_nk_dq), dq_in_specs, dq_out_specs, dq_out_shape,
        [pltpu.VMEM((block_q, d), jnp.float32)],
    )(*scalar_dq, qp, kp, vp, gp, lse_p, delta_p, *extra_args)
    dq = dq_res[0]
    dbias = None
    if has_bias:
        db = dq_res[1][:, :lq, :lk].reshape(b, h, lq, lk)
        for ax in range(2):
            if bias.shape[ax] == 1:
                db = db.sum(axis=ax, keepdims=True)
        dbias = db.astype(bias.dtype)

    dkv_in_specs = [
        pl.BlockSpec((1, block_q, d),
                     (lambda bh, ik, iq, lo, hi:
                      (bh, _other_blk(bh, ik, iq, lo, hi), 0)) if has_seg
                     else (lambda bh, ik, iq: (bh, iq, 0))),
        pl.BlockSpec((1, block_k, d), sig(lambda bh, ik, iq: (bh, ik, 0))),
        pl.BlockSpec((1, block_k, d), sig(lambda bh, ik, iq: (bh, ik, 0))),
        pl.BlockSpec((1, block_q, d),
                     (lambda bh, ik, iq, lo, hi:
                      (bh, _other_blk(bh, ik, iq, lo, hi), 0)) if has_seg
                     else (lambda bh, ik, iq: (bh, iq, 0))),
        pl.BlockSpec((1, block_q, 1),
                     (lambda bh, ik, iq, lo, hi:
                      (bh, _other_blk(bh, ik, iq, lo, hi), 0)) if has_seg
                     else (lambda bh, ik, iq: (bh, iq, 0))),
        pl.BlockSpec((1, block_q, 1),
                     (lambda bh, ik, iq, lo, hi:
                      (bh, _other_blk(bh, ik, iq, lo, hi), 0)) if has_seg
                     else (lambda bh, ik, iq: (bh, iq, 0))),
    ] + extra_dkv_specs

    dk, dv = call(
        wrap(functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                               block_q=block_q, block_k=block_k,
                               n_q=grid_nq_dkv, h=h, remap=remap),
             6, False),
        (b * h, n_k, grid_nq_dkv), dkv_in_specs,
        [
            pl.BlockSpec((1, block_k, d),
                         sig(lambda bh, ik, iq: (bh, ik, 0))),
            pl.BlockSpec((1, block_k, d),
                         sig(lambda bh, ik, iq: (bh, ik, 0))),
        ],
        [
            jax.ShapeDtypeStruct((b * h, lk_p, d), k.dtype,
                                 vma=_vma_of(q, k, v, g)),
            jax.ShapeDtypeStruct((b * h, lk_p, d), v.dtype,
                                 vma=_vma_of(q, k, v, g)),
        ],
        [pltpu.VMEM((block_k, d), jnp.float32),
         pltpu.VMEM((block_k, d), jnp.float32)],
    )(*scalar_dkv, qp, kp, vp, gp, lse_p, delta_p, *extra_args)

    dq = dq[:, :lq, :d_orig].reshape(b, h, lq, d_orig)
    dk = dk[:, :lk, :d_orig].reshape(b, h, lk, d_orig)
    dv = dv[:, :lk, :d_orig].reshape(b, h, lk, d_orig)
    return dq, dk, dv, dbias


def _vjp_bwd(causal, scale, block_q, block_k, interpret, seg_max_kv_blocks,
             res, g):
    """Flash backward: Pallas two-kernel path (TPU / interpret) with
    fused dbias + segment masking; XLA-scanned recompute off-TPU."""
    q_, k_, v_, bias_, seg_, out_, lse_ = res
    if scale is None:
        scale_v = q_.shape[-1] ** -0.5
    else:
        scale_v = scale
    if interpret or jax.default_backend() == "tpu":
        dq, dk, dv, dbias = _flash_bwd_pallas(
            q_, k_, v_, bias_, seg_, out_, lse_, g, causal, scale_v,
            block_q, block_k, interpret, seg_max_kv_blocks)
        return (dq, dk, dv, dbias, None)
    return _vjp_bwd_xla(causal, scale_v, block_q, block_k, res, g)


def _vjp_bwd_xla(causal, scale, block_q, block_k, res, g):
    """Scanned recompute backward: per-step memory O(Lq·block_k)."""
    q, k, v, bias, segment_ids, out, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # Matmuls stay in the input dtype (bf16 rides the MXU natively; fp32
    # gets the HIGHEST 3-pass treatment) with fp32 accumulation; only the
    # softmax reconstruction is explicit fp32.
    qf = q
    gf = g.astype(q.dtype)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # (B,H,Lq) fp32
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    ein = functools.partial(jnp.einsum, precision=prec,
                            preferred_element_type=jnp.float32)

    bk = min(block_k, lk)
    n_k = _cdiv(lk, bk)
    lk_p = n_k * bk
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    bias_b = None
    if bias is not None:
        bias_b = _pad_to(jnp.broadcast_to(bias, (b, h, lq, lk)), 3, bk)

    row = jnp.arange(lq)[:, None]
    q_ids = kv_ids = None
    if segment_ids is not None:
        q_ids = segment_ids[0].astype(jnp.int32)            # (B, Lq)
        kv_ids = _pad_to(segment_ids[1].astype(jnp.int32) + 1, 1, bk) - 1

    def body(dq, ik):
        ks = ik * bk
        kb = jax.lax.dynamic_slice_in_dim(kp, ks, bk, axis=2)
        vb = jax.lax.dynamic_slice_in_dim(vp, ks, bk, axis=2)
        s = ein("bhqd,bhkd->bhqk", qf, kb) * scale
        if bias_b is not None:
            s = s + jax.lax.dynamic_slice_in_dim(bias_b, ks, bk, axis=3)
        col = ks + jnp.arange(bk)[None, :]
        mask = col < lk
        if causal:
            mask = jnp.logical_and(mask, col <= row)
        if q_ids is not None:
            kv_b = jax.lax.dynamic_slice_in_dim(kv_ids, ks, bk, axis=1)
            mask = jnp.logical_and(
                mask, (q_ids[:, None, :, None]
                       == kv_b[:, None, None, :]))
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse[..., None])          # fp32
        pc = p.astype(q.dtype)
        dv_b = ein("bhqk,bhqd->bhkd", pc, gf)
        dp = ein("bhqd,bhkd->bhqk", gf, vb)      # fp32 out
        ds = p * (dp - delta[..., None])         # fp32
        dsc = ds.astype(q.dtype)
        dq = dq + ein("bhqk,bhkd->bhqd", dsc, kb) * scale
        dk_b = ein("bhqk,bhqd->bhkd", dsc, qf) * scale
        return dq, (dk_b, dv_b, ds if bias_b is not None else jnp.zeros(()))

    dq0 = jnp.zeros((b, h, lq, d), jnp.float32)
    dq, (dk_blocks, dv_blocks, ds_blocks) = jax.lax.scan(
        body, dq0, jnp.arange(n_k))
    # (n_k, B, H, bk, D) -> (B, H, Lk, D)
    dk = jnp.moveaxis(dk_blocks, 0, 3).reshape(b, h, lk_p, d)[:, :, :lk]
    dv = jnp.moveaxis(dv_blocks, 0, 3).reshape(b, h, lk_p, d)[:, :, :lk]
    dbias = None
    if bias is not None:
        db = jnp.moveaxis(ds_blocks, 0, 4).reshape(b, h, lq, lk_p)[..., :lk]
        for ax in range(2):
            if bias.shape[ax] == 1:
                db = db.sum(axis=ax, keepdims=True)
        dbias = db.astype(bias.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias, None)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Position-aware flash kernels — the per-hop primitive for ring attention.
#
# Ring attention shards the sequence over a mesh axis; each hop attends the
# local Q block against a *visiting* K/V block whose GLOBAL positions are not
# its local indices (and, under the causal zig-zag layout, not even
# contiguous: each device holds chunk pair (i, 2n-1-i)).  These kernels mask
# by global position computed in-kernel from two scalar segment offsets held
# in SMEM — so per-hop memory is O(block_q·block_k) in VMEM, never a
# materialized (Lq_local, Lk_local) logits tensor.  Local index idx maps to
#   pos = off[0] + idx            if idx <  seg
#   pos = off[1] + (idx - seg)    otherwise
# (one contiguous span is expressed as seg = L_local).
# ---------------------------------------------------------------------------


def _pos_of(idx, off_ref, seg):
    """Global position of local index array ``idx`` (2-D int32)."""
    return jnp.where(idx < seg, off_ref[0] + idx, off_ref[1] + (idx - seg))


def _pos_bounds(start, length, off_ref, seg, actual):
    """Scalar (min_pos, max_pos) over local index range [start, start+length)
    clamped to [0, actual) — for whole-block skip decisions."""
    end = jnp.minimum(start + length, actual) - 1
    has0 = start < seg
    has1 = end >= seg
    lo0 = off_ref[0] + start
    hi0 = off_ref[0] + jnp.minimum(end, seg - 1)
    lo1 = off_ref[1] + jnp.maximum(start, seg) - seg
    hi1 = off_ref[1] + (end - seg)
    both = jnp.logical_and(has0, has1)
    min_pos = jnp.where(both, jnp.minimum(lo0, lo1),
                        jnp.where(has0, lo0, lo1))
    max_pos = jnp.where(both, jnp.maximum(hi0, hi1),
                        jnp.where(has0, hi0, hi1))
    return min_pos, max_pos


def _pos_mask(q_start, k_start, qoff_ref, koff_ref, *, causal, valid_len,
              seg_q, seg_k, lk_actual, block_q, block_k):
    """(block_q, block_k) bool mask from global positions."""
    cidx = k_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    mask = cidx < lk_actual
    col_pos = _pos_of(cidx, koff_ref, seg_k)
    if valid_len is not None:
        mask = jnp.logical_and(mask, col_pos < valid_len)
    if causal:
        ridx = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        row_pos = _pos_of(ridx, qoff_ref, seg_q)
        mask = jnp.logical_and(mask, col_pos <= row_pos)
    return mask


def _pos_run(q_start, k_start, qoff_ref, koff_ref, *, causal, valid_len,
             seg_q, seg_k, lq_actual, lk_actual, block_q, block_k):
    """Scalar: does this (q block, k block) pair have any unmasked entry?"""
    run = k_start < lk_actual
    min_cp, _ = _pos_bounds(k_start, block_k, koff_ref, seg_k, lk_actual)
    if valid_len is not None:
        run = jnp.logical_and(run, min_cp < valid_len)
    if causal:
        _, max_rp = _pos_bounds(q_start, block_q, qoff_ref, seg_q, lq_actual)
        run = jnp.logical_and(run, min_cp <= max_rp)
    return run


def _fwd_kernel_pos(q_ref, k_ref, v_ref, qoff_ref, koff_ref, o_ref, lse_ref,
                    acc_ref, m_ref=None, l_ref=None,
                    *, scale, causal, valid_len, seg_q, seg_k,
                    lq_actual, lk_actual, block_q, block_k, n_k, d,
                    mxu_rowsum=False, bounded=False, smode="exp"):
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if not bounded:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        if not mxu_rowsum:
            l_ref[:] = jnp.zeros_like(l_ref)

    q_start = iq * block_q
    k_start = ik * block_k
    run = _pos_run(q_start, k_start, qoff_ref, koff_ref, causal=causal,
                   valid_len=valid_len, seg_q=seg_q, seg_k=seg_k,
                   lq_actual=lq_actual, lk_actual=lk_actual,
                   block_q=block_q, block_k=block_k)
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # the per-logit mask is ~3 VPU ops on a ~6-op softmax budget; skip it
    # statically when nothing can mask (no causal, no valid_len, and the
    # k extent is block-aligned so no padded tail exists) — the fast path
    # for the aligned x×x call of joint_flash_attention
    no_mask = (not causal and valid_len is None
               and lk_actual % block_k == 0)

    prescale = _is_pow2(scale)
    fold = smode in ("exp2", "fma") and not prescale   # see _fwd_kernel
    rebase = smode == "exp2"
    c_rem = scale if fold else 1.0
    k2 = c_rem * (LOG2E if rebase else 1.0)
    efn = jnp.exp2 if rebase else jnp.exp

    @pl.when(run)
    def _compute():
        qt = _ld(q_ref, block_q, d)
        s = jax.lax.dot_general(
            qt * jnp.asarray(scale, qt.dtype) if prescale else qt,
            _ld(k_ref, block_k, d),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if not prescale and not fold:
            s = s * scale
        if not no_mask:
            mask = _pos_mask(q_start, k_start, qoff_ref, koff_ref,
                             causal=causal, valid_len=valid_len, seg_q=seg_q,
                             seg_k=seg_k, lk_actual=lk_actual,
                             block_q=block_q, block_k=block_k)
            s = jnp.where(mask, s, NEG_INF)
        vt = _ld(v_ref, block_k, d)
        if bounded:
            # Bounded-logit fast path (stability="bounded"): fixed max 0 —
            # no per-logit max-reduce, no m scratch, no alpha rescale of
            # the accumulator.  exp(-M) would cancel in acc/l for ANY
            # fixed M, so correctness only needs |logit| < ~80 (fp32 exp
            # range with l <= L*e^max); provable for qk-normed models.
            # Measured 1.16x at the SD3 joint x*x op point
            # (tools/probe_fixed_max.py; the exp itself is free — the
            # stability machinery was the cost).
            p = efn(s * k2) if (rebase or fold) else jnp.exp(s)
            if mxu_rowsum:
                vt = jnp.concatenate(
                    [vt, jnp.ones((block_k, 1), vt.dtype)], axis=-1)
            else:
                l_ref[:] = jnp.broadcast_to(
                    l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True),
                    l_ref.shape)
            acc_ref[:] += jax.lax.dot_general(
                p.astype(v_ref.dtype), vt,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        else:
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            if rebase or fold:
                alpha = efn((m_prev - m_new) * k2)
                p = efn(s * k2 - m_new * k2)
            else:
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
            if mxu_rowsum:
                # ones-column V augment: PV and the softmax denominator
                # from one matmul (see _fwd_kernel; measured 1.11x @4096²)
                vt = jnp.concatenate(
                    [vt, jnp.ones((block_k, 1), vt.dtype)], axis=-1)
            else:
                l_ref[:] = jnp.broadcast_to(
                    l_ref[:, :1] * alpha
                    + jnp.sum(p, axis=-1, keepdims=True),
                    l_ref.shape)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype), vt,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ik == n_k - 1)
    def _finalize():
        l = acc_ref[:, d:d + 1] if mxu_rowsum else l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        _st(o_ref, acc_ref[:, :d] / safe_l)
        # fully-masked rows keep m = NEG_INF -> lse = NEG_INF + log 1, which
        # the ring's log-sum-exp merge treats as "no contribution".
        if bounded:   # fixed max 0: lse = log l; l == 0 means fully masked
            _st(lse_ref, jnp.where(l == 0.0, NEG_INF, jnp.log(safe_l)))
        else:
            _st(lse_ref, m_ref[:, :1] * c_rem + jnp.log(safe_l))


def flash_attention_pos(q, k, v, q_offsets, kv_offsets, *, causal=False,
                        scale=None, seg_q=None, seg_k=None, valid_len=None,
                        block_q: int = 1024, block_k: int = 1024,
                        interpret=False, stability: str = "online"):
    """Flash attention with global-position masking: returns (out, lse).

    q (B,H,Lq,D), k/v (B,H,Lk,D) are LOCAL blocks of a longer sequence;
    ``q_offsets``/``kv_offsets`` are (2,) int32 global offsets of the two
    contiguous segments each block is made of (segment boundary at
    ``seg_q``/``seg_k`` local index; pass seg = L for one contiguous span).
    Masks: keys with global position >= ``valid_len`` (if given), and
    key_pos > query_pos when ``causal``.  lse is fp32 (B,H,Lq); fully-masked
    rows yield lse = -1e30 and a zero partial.  NOT differentiable — ring
    attention drives the backward via flash_bwd_pos.

    ``stability``: "online" (default) runs the running-max online softmax;
    "bounded" uses a fixed max of 0 — exact softmax whenever every logit
    stays within fp32 exp range (|scale·q·k| < ~80, guaranteed by qk-norm
    models) and measured 1.16x at the SD3 joint x*x op point
    (tools/probe_fixed_max.py: the stability machinery, not the exp, is
    the per-logit cost).
    """
    if stability not in ("online", "bounded"):
        raise ValueError(f"stability must be online|bounded: {stability}")
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    seg_q = lq if seg_q is None else seg_q
    seg_k = lk if seg_k is None else seg_k
    if d > 256:   # wide heads: keep scoped VMEM under 16 MB (see _flash_fwd)
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
    block_q = min(block_q, _cdiv(lq, 128) * 128)
    block_k = min(block_k, _cdiv(lk, 128) * 128)
    qp = _pad_to(q.reshape(b * h, lq, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, lk, d), 1, block_k)
    vp = _pad_to(v.reshape(b * h, lk, d), 1, block_k)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    n_q, n_k = lq_p // block_q, lk_p // block_k

    mxu_rowsum = (d % 128) != 0
    bounded = stability == "bounded"
    # the m scratch exists only for the online running max; the bounded
    # fast path drops it entirely (ADVICE r4: don't allocate VMEM on the
    # path whose point is shaving per-logit overhead)
    scratch = [pltpu.VMEM((block_q, d + 1 if mxu_rowsum else d),
                          jnp.float32)]
    if not bounded:
        scratch.append(pltpu.VMEM((block_q, 128), jnp.float32))
    if not mxu_rowsum:
        scratch.append(pltpu.VMEM((block_q, 128), jnp.float32))
    body = functools.partial(
        _fwd_kernel_pos, scale=scale, causal=causal, valid_len=valid_len,
        seg_q=seg_q, seg_k=seg_k, lq_actual=lq, lk_actual=lk,
        block_q=block_q, block_k=block_k, n_k=n_k, d=d,
        mxu_rowsum=mxu_rowsum, bounded=bounded,
        smode=_resolve_softmax(q.dtype, False))

    def _kernel_pos(q_ref, k_ref, v_ref, qoff, koff, o_ref, lse_ref, *scr):
        scr = list(scr)
        acc = scr.pop(0)
        m = None if bounded else scr.pop(0)
        l = None if mxu_rowsum else scr.pop(0)
        body(q_ref, k_ref, v_ref, qoff, koff, o_ref, lse_ref, acc, m, l)

    out, lse = pl.pallas_call(
        _kernel_pos,
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
            jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype,
                                 vma=_vma_of(q, k, v)),
            jax.ShapeDtypeStruct((b * h, lq_p, 1), jnp.float32,
                                 vma=_vma_of(q, k, v)),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(qp, kp, vp, q_offsets.astype(jnp.int32), kv_offsets.astype(jnp.int32))
    out = out[:, :lq].reshape(b, h, lq, d)
    lse = lse[:, :lq, 0].reshape(b, h, lq)
    return out, lse


def _bwd_dq_kernel_pos(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                       qoff_ref, koff_ref, dq_ref, acc_ref,
                       *, scale, causal, valid_len, seg_q, seg_k,
                       lq_actual, lk_actual, block_q, block_k, n_k):
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = iq * block_q
    k_start = ik * block_k
    run = _pos_run(q_start, k_start, qoff_ref, koff_ref, causal=causal,
                   valid_len=valid_len, seg_q=seg_q, seg_k=seg_k,
                   lq_actual=lq_actual, lk_actual=lk_actual,
                   block_q=block_q, block_k=block_k)
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    no_mask = (not causal and valid_len is None
               and lk_actual % block_k == 0)  # see _fwd_kernel_pos

    prescale = _is_pow2(scale)

    @pl.when(run)
    def _():
        qt = q_ref[0]
        s = jax.lax.dot_general(
            qt * jnp.asarray(scale, qt.dtype) if prescale else qt,
            k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if not prescale:
            s = s * scale
        # p is normalized by the GLOBAL lse (computed across all hops), so
        # per-hop dq contributions just add up. (Padded q rows carry
        # lse = 1e30 -> p = 0 without any mask.)
        if no_mask:
            p = jnp.exp(s - lse_ref[0])
        else:
            mask = _pos_mask(q_start, k_start, qoff_ref, koff_ref,
                             causal=causal, valid_len=valid_len, seg_q=seg_q,
                             seg_k=seg_k, lk_actual=lk_actual,
                             block_q=block_q, block_k=block_k)
            p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        dp = jax.lax.dot_general(
            g_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        ds = p * (dp - delta_ref[0])
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    @pl.when(ik == n_k - 1)
    def _fin():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_pos(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                        qoff_ref, koff_ref, dk_ref, dv_ref, acc_dk, acc_dv,
                        *, scale, causal, valid_len, seg_q, seg_k,
                        lq_actual, lk_actual, block_q, block_k, n_q):
    ik = pl.program_id(1)
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    q_start = iq * block_q
    k_start = ik * block_k
    run = _pos_run(q_start, k_start, qoff_ref, koff_ref, causal=causal,
                   valid_len=valid_len, seg_q=seg_q, seg_k=seg_k,
                   lq_actual=lq_actual, lk_actual=lk_actual,
                   block_q=block_q, block_k=block_k)
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    no_mask = (not causal and valid_len is None
               and lk_actual % block_k == 0)  # see _fwd_kernel_pos

    prescale = _is_pow2(scale)

    @pl.when(run)
    def _():
        qt = q_ref[0]
        s = jax.lax.dot_general(
            qt * jnp.asarray(scale, qt.dtype) if prescale else qt,
            k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if not prescale:
            s = s * scale
        if no_mask:
            p = jnp.exp(s - lse_ref[0])
        else:
            mask = _pos_mask(q_start, k_start, qoff_ref, koff_ref,
                             causal=causal, valid_len=valid_len, seg_q=seg_q,
                             seg_k=seg_k, lk_actual=lk_actual,
                             block_q=block_q, block_k=block_k)
            p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        acc_dv[:] += jax.lax.dot_general(
            p.astype(g_ref.dtype), g_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dp = jax.lax.dot_general(
            g_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        ds = p * (dp - delta_ref[0])
        acc_dk[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    @pl.when(iq == n_q - 1)
    def _fin():
        dk_ref[0] = (acc_dk[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[:].astype(dv_ref.dtype)


def flash_bwd_pos(q, k, v, g, lse, delta, q_offsets, kv_offsets, *,
                  causal=False, scale=None, seg_q=None, seg_k=None,
                  valid_len=None, block_q: int = 1024, block_k: int = 1024,
                  interpret=False):
    """One hop of the ring-attention backward: (dq, dk, dv) of this q block
    against this (visiting) k/v block, under the GLOBAL softmax.

    ``lse``: global log-sum-exp (B,H,Lq) fp32 from the merged forward;
    ``delta``: sum(g·out) over D, (B,H,Lq) fp32 — both computed once per
    device, reused for every hop.  Masking contract matches
    :func:`flash_attention_pos`.
    """
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
    gp = _pad_to(g.reshape(b * h, lq, d), 1, block_q)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    n_q, n_k = lq_p // block_q, lk_p // block_k
    # padded q rows get lse = +inf -> p = 0: they contribute nothing to dk/dv
    lse_p = jnp.pad(lse.reshape(b * h, lq, 1),
                    ((0, 0), (0, lq_p - lq), (0, 0)), constant_values=1e30)
    delta_p = _pad_to(delta.reshape(b * h, lq, 1), 1, block_q)
    qo = q_offsets.astype(jnp.int32)
    ko = kv_offsets.astype(jnp.int32)

    common = dict(scale=scale, causal=causal, valid_len=valid_len,
                  seg_q=seg_q, seg_k=seg_k, lq_actual=lq, lk_actual=lk,
                  block_q=block_q, block_k=block_k)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_pos, n_k=n_k, **common),
        grid=(b * h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype,
                                       vma=_vma_of(q, k, v, g)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta_p, qo, ko)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_pos, n_q=n_q, **common),
        grid=(b * h, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, ik, iq: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, ik, iq: (bh, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, ik, iq: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, ik, iq: (bh, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lk_p, d), k.dtype,
                                 vma=_vma_of(q, k, v, g)),
            jax.ShapeDtypeStruct((b * h, lk_p, d), v.dtype,
                                 vma=_vma_of(q, k, v, g)),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta_p, qo, ko)

    dq = dq[:, :lq].reshape(b, h, lq, d)
    dk = dk[:, :lk].reshape(b, h, lk, d)
    dv = dv[:, :lk].reshape(b, h, lk, d)
    return dq, dk, dv


# --------------------------------------------------------------------------
# Split-KV joint attention (MMDiT context‖latent without the alignment tax)
# --------------------------------------------------------------------------
# SD3's joint sequence is Lc+Lx = 154+4096 = 4250 tokens: as ONE flash call
# it pads to 5120 on both axes (block 1024), wasting 31% of the logit work
# — and the per-logit (softmax/VPU) cost is what bounds this op point
# (tools/probe_joint_attn.py: D=128/H=12 halves the time at equal matmul
# FLOPs). Decomposing over the KV and Q splits gives four calls whose big
# one (x×x, 4096²) is perfectly block-aligned — total logit work is 1.046×
# the ideal instead of 1.31× — and the partials merge EXACTLY through their
# log-sum-exps (same math as ring attention's hop merge). Backward mirrors
# the ring: each partial's Pallas backward runs under the GLOBAL lse/delta
# and the dq/dk/dv contributions sum.


def merge_attention_partials(o1, lse1, o2, lse2):
    """Exactly combine two attention partials via their log-sum-exps."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    out = (o1 * (w1 / denom)[..., None].astype(o1.dtype)
           + o2 * (w2 / denom)[..., None].astype(o2.dtype))
    return out, m + jnp.log(denom)


def _joint_fwd_impl(qc, kc, vc, qx, kx, vx, scale, block_q, block_k,
                    interpret, stability="online"):
    z = jnp.zeros((2,), jnp.int32)
    f = functools.partial(flash_attention_pos, scale=scale, block_q=block_q,
                          block_k=block_k, interpret=interpret,
                          stability=stability)
    o_cc, l_cc = f(qc, kc, vc, z, z)
    o_cx, l_cx = f(qc, kx, vx, z, z)
    o_c, lse_c = merge_attention_partials(o_cc, l_cc, o_cx, l_cx)
    o_xc, l_xc = f(qx, kc, vc, z, z)
    o_xx, l_xx = f(qx, kx, vx, z, z)
    o_x, lse_x = merge_attention_partials(o_xc, l_xc, o_xx, l_xx)
    return o_c, o_x, lse_c, lse_x


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def joint_flash_attention(qc, kc, vc, qx, kx, vx, scale, block_q=1024,
                          block_k=1024, interpret=False,
                          stability="online"):
    """Joint attention over [context ‖ x] without concatenation or
    alignment padding. All tensors (B, H, L, D); returns (out_c, out_x) —
    each query stream attends over BOTH kv streams, bit-exact (up to fp
    reassociation) with flash over the concatenated sequence.
    ``stability="bounded"`` takes the fixed-max fast path (exact for
    bounded logits, e.g. qk-norm models — see flash_attention_pos)."""
    o_c, o_x, _, _ = _joint_fwd_impl(qc, kc, vc, qx, kx, vx, scale,
                                     block_q, block_k, interpret, stability)
    return o_c, o_x


def _joint_vjp_fwd(qc, kc, vc, qx, kx, vx, scale, block_q, block_k,
                   interpret, stability):
    o_c, o_x, lse_c, lse_x = _joint_fwd_impl(
        qc, kc, vc, qx, kx, vx, scale, block_q, block_k, interpret,
        stability)
    return (o_c, o_x), (qc, kc, vc, qx, kx, vx, o_c, o_x, lse_c, lse_x)


def _joint_vjp_bwd(scale, block_q, block_k, interpret, stability, res, g):
    qc, kc, vc, qx, kx, vx, o_c, o_x, lse_c, lse_x = res
    g_c, g_x = g
    z = jnp.zeros((2,), jnp.int32)
    bwd = functools.partial(flash_bwd_pos, scale=scale, block_q=block_q,
                            block_k=block_k, interpret=interpret)
    delta_c = jnp.sum(g_c.astype(jnp.float32) * o_c.astype(jnp.float32),
                      axis=-1)
    delta_x = jnp.sum(g_x.astype(jnp.float32) * o_x.astype(jnp.float32),
                      axis=-1)
    dqc1, dkc1, dvc1 = bwd(qc, kc, vc, g_c, lse_c, delta_c, z, z)
    dqc2, dkx1, dvx1 = bwd(qc, kx, vx, g_c, lse_c, delta_c, z, z)
    dqx1, dkc2, dvc2 = bwd(qx, kc, vc, g_x, lse_x, delta_x, z, z)
    dqx2, dkx2, dvx2 = bwd(qx, kx, vx, g_x, lse_x, delta_x, z, z)
    add = lambda a, b: (a.astype(jnp.float32)
                        + b.astype(jnp.float32)).astype(a.dtype)
    return (add(dqc1, dqc2), add(dkc1, dkc2), add(dvc1, dvc2),
            add(dqx1, dqx2), add(dkx1, dkx2), add(dvx1, dvx2))


joint_flash_attention.defvjp(_joint_vjp_fwd, _joint_vjp_bwd)
