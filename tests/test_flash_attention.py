"""Flash-attention kernel tests (interpreter mode on CPU; compiled on TPU).

The same cases run compiled on real TPU via FDSD_TEST_PLATFORM=axon.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.ops.attention import _xla_attention
from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import flash_attention

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines

INTERPRET = jax.default_backend() != "tpu"


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize(
    "b,h,lq,lk,d,causal,with_bias",
    [
        (1, 2, 128, 128, 64, False, False),
        (1, 2, 256, 128, 32, False, False),   # rectangular, small head_dim
        (1, 1, 300, 300, 64, False, False),   # unaligned lengths
        (1, 2, 256, 256, 64, True, False),    # causal
        (1, 2, 128, 256, 128, False, True),   # additive bias
    ])
def test_flash_matches_xla(b, h, lq, lk, d, causal, with_bias):
    q = _rand((b, h, lq, d), 0)
    k = _rand((b, h, lk, d), 1)
    v = _rand((b, h, lk, d), 2)
    bias = _rand((1, h, lq, lk), 3) * 0.5 if with_bias else None
    got = flash_attention(q, k, v, bias=bias, causal=causal,
                          block_q=128, block_k=128, interpret=INTERPRET)
    want = _xla_attention(q, k, v, bias, causal, d**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_flash_grads_match_xla():
    q = _rand((1, 2, 128, 64), 4)
    k = _rand((1, 2, 128, 64), 5)
    v = _rand((1, 2, 128, 64), 6)

    def f(q, k, v):
        return flash_attention(q, k, v, block_q=128, block_k=128,
                               interpret=INTERPRET).sum()

    def g(q, k, v):
        return _xla_attention(q, k, v, None, False, 64**-0.5).sum()

    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_flash_bf16():
    q = _rand((1, 2, 256, 64), 7).astype(jnp.bfloat16)
    k = _rand((1, 2, 256, 64), 8).astype(jnp.bfloat16)
    v = _rand((1, 2, 256, 64), 9).astype(jnp.bfloat16)
    got = flash_attention(q, k, v, block_q=128, block_k=128,
                          interpret=INTERPRET)
    assert got.dtype == jnp.bfloat16
    want = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32), None, False, 64**-0.5)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), atol=2e-2)


def test_attention_blhd_wrapper():
    """attention_blhd (B,L,H,D) must equal BHLD attention on transposed
    inputs, forward and grad (it is the call-site convention for MMDiT's
    joint attention and multi_head_attention)."""
    from from_ddpm_to_stable_diffusion_tpu.ops.attention import (
        attention_blhd)

    q = _rand((2, 128, 3, 40), 10)
    k = _rand((2, 128, 3, 40), 11)
    v = _rand((2, 128, 3, 40), 12)
    t = lambda x: x.transpose(0, 2, 1, 3)
    got = attention_blhd(q, k, v)
    want = _xla_attention(t(q), t(k), t(v), None, False, 40**-0.5)
    np.testing.assert_allclose(np.asarray(t(got)), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    g1 = jax.grad(lambda q: attention_blhd(q, k, v).sum())(q)
    g2 = jax.grad(
        lambda q: _xla_attention(t(q), t(k), t(v), None, False,
                                 40**-0.5).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


# --------------------------------------------------------------------------
# Pallas dbias backward + segment-id (packing) masking
# --------------------------------------------------------------------------
@pytest.mark.parametrize("bias_shape", [(1, 2, 128, 128), (2, 2, 128, 128),
                                        (1, 1, 128, 128)])
def test_flash_bias_grads_pallas(bias_shape):
    """The bias path backward is the Pallas kernel pair (no XLA fallback):
    dq/dk/dv AND dbias must match autodiff of the dense oracle, including
    sum-reduction over broadcast bias dims."""
    q, k, v = (_rand((2, 2, 128, 64), s) for s in (20, 21, 22))
    bias = _rand(bias_shape, 23) * 0.5
    cot = _rand((2, 2, 128, 64), 24)

    def f(q, k, v, bias):
        return (flash_attention(q, k, v, bias=bias, block_q=128,
                                block_k=128, interpret=INTERPRET)
                * cot).sum()

    def g(q, k, v, bias):
        return (_xla_attention(q, k, v, bias, False, 64**-0.5) * cot).sum()

    g1 = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(g, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g1, g2):
        assert a.shape == b_.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def _packed_case(seed=30, l=128, d=32):
    """Two sequences (70 + 58 tokens) packed into one row."""
    split = 70
    q, k, v = (_rand((1, 2, l, d), seed + i) for i in range(3))
    seg = jnp.concatenate([jnp.zeros(split, jnp.int32),
                           jnp.ones(l - split, jnp.int32)])[None]
    return q, k, v, seg, split


def _seg_bias(seg_q, seg_kv):
    """Additive-mask oracle for segment masking."""
    same = seg_q[0][:, None] == seg_kv[0][None, :]
    return jnp.where(same, 0.0, -1e30)[None, None]


@pytest.mark.parametrize("causal", [False, True])
def test_flash_segment_ids_match_unpacked(causal):
    """Packed 2-sequence attention ≡ each sequence attended separately."""
    q, k, v, seg, split = _packed_case()
    got = flash_attention(q, k, v, segment_ids=(seg, seg), causal=causal,
                          block_q=128, block_k=128, interpret=INTERPRET)
    for sl in (slice(0, split), slice(split, None)):
        want = _xla_attention(q[:, :, sl], k[:, :, sl], v[:, :, sl],
                              None, causal, 32**-0.5)
        np.testing.assert_allclose(np.asarray(got[:, :, sl]),
                                   np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_segment_ids_grads():
    q, k, v, seg, _ = _packed_case(seed=40)
    cot = _rand(q.shape, 44)

    def f(q, k, v):
        return (flash_attention(q, k, v, segment_ids=(seg, seg),
                                block_q=128, block_k=128,
                                interpret=INTERPRET) * cot).sum()

    def g(q, k, v):
        return (_xla_attention(q, k, v, _seg_bias(seg, seg), False,
                               32**-0.5) * cot).sum()

    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_flash_segment_ids_with_bias_and_grads():
    """bias + segment ids compose; dbias is zero at cross-segment pairs."""
    q, k, v, seg, split = _packed_case(seed=50)
    bias = _rand((1, 2, 128, 128), 53) * 0.3

    def f(q, k, v, bias):
        return flash_attention(q, k, v, bias=bias, segment_ids=(seg, seg),
                               block_q=128, block_k=128,
                               interpret=INTERPRET).sum()

    def g(q, k, v, bias):
        return _xla_attention(q, k, v, bias + _seg_bias(seg, seg), False,
                              32**-0.5).sum()

    # 5e-5 on a ~10.7 sum: the MXU rowsum reassociates the fp32 softmax
    # denominator (matmul tree order vs VPU reduce) — rel err ~2e-6
    np.testing.assert_allclose(np.asarray(f(q, k, v, bias)),
                               np.asarray(g(q, k, v, bias)), atol=5e-5)
    g1 = jax.grad(f, argnums=(0, 3))(q, k, v, bias)
    g2 = jax.grad(g, argnums=(0, 3))(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=2e-4)
    db = np.asarray(g1[1])
    np.testing.assert_allclose(db, np.asarray(g2[1]), atol=2e-4)
    assert (db[0, :, :split, split:] == 0).all()
    assert (db[0, :, split:, :split] == 0).all()


@pytest.mark.parametrize("causal", [False, True])
def test_flash_many_segments_block_skip_exact(causal):
    """8 packed sequences of 96 tokens (boundaries NOT block-aligned at
    block 128): the block-sparse segment skip must be invisible —
    fwd + grads identical to the additive-mask oracle."""
    n_seq, seq_len, d = 8, 96, 32
    l = n_seq * seq_len
    q, k, v = (_rand((1, 2, l, d), 70 + i) for i in range(3))
    seg = jnp.repeat(jnp.arange(n_seq, dtype=jnp.int32), seq_len)[None]
    cot = _rand(q.shape, 74)

    def f(q, k, v):
        return (flash_attention(q, k, v, segment_ids=(seg, seg),
                                causal=causal, block_q=128, block_k=128,
                                interpret=INTERPRET) * cot).sum()

    def f_ref(q, k, v):
        return (_xla_attention(q, k, v, _seg_bias(seg, seg), causal,
                               d ** -0.5) * cot).sum()

    got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_seg_max_kv_blocks_hint_exact(causal):
    """The static grid-truncation hint (seg_max_kv_blocks) must be
    invisible: 8×96-token packed layout at block 128 → a q block touches
    ≤2 segments whose union spans ≤3 contiguous k blocks (vs the full
    grid's 6); fwd + grads ≡ the full-grid kernel."""
    n_seq, seq_len, d = 8, 96, 32
    l = n_seq * seq_len
    q, k, v = (_rand((1, 2, l, d), 80 + i) for i in range(3))
    seg = jnp.repeat(jnp.arange(n_seq, dtype=jnp.int32), seq_len)[None]
    cot = _rand(q.shape, 84)

    def f(hint):
        def g(q, k, v):
            return (flash_attention(
                q, k, v, segment_ids=(seg, seg), causal=causal,
                block_q=128, block_k=128, interpret=INTERPRET,
                seg_max_kv_blocks=hint) * cot).sum()
        return g

    got = jax.grad(f(3), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(f(None), argnums=(0, 1, 2))(q, k, v)
    for gg, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                   atol=3e-4, rtol=1e-3)


def test_flash_seg_hint_asymmetric_blocks_grads_exact():
    """Regression: with block_q != block_k the dkv kernel's grid bound is
    the TRANSPOSED overlap count (q blocks per k block), not the user's
    k-per-q hint — an unconverted hint silently truncated dk/dv.  Traced
    segment ids (jit args) bypass the concrete-layout check, so this
    exercises the trusted-hint path."""
    n_seq, seq_len, d = 4, 384, 32
    l = n_seq * seq_len
    q, k, v = (_rand((1, 2, l, d), 60 + i) for i in range(3))
    seg = jnp.repeat(jnp.arange(n_seq, dtype=jnp.int32), seq_len)[None]
    cot = _rand(q.shape, 64)

    def f(hint):
        @jax.jit
        def g(q, k, v, seg):
            return (flash_attention(
                q, k, v, segment_ids=(seg, seg), block_q=128, block_k=384,
                interpret=INTERPRET, seg_max_kv_blocks=hint) * cot).sum()
        return g

    # hint per the docstring formula: ceil(384/384)+1 = 2 (q side)
    got = jax.grad(f(2), argnums=(0, 1, 2))(q, k, v, seg)
    want = jax.grad(f(None), argnums=(0, 1, 2))(q, k, v, seg)
    for gg, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                   atol=3e-4, rtol=1e-3)


def test_flash_seg_hint_validation():
    """Concrete segment ids + an undersized hint must raise, not silently
    drop attention; bias + hint is rejected outright."""
    l, d = 256, 32
    q, k, v = (_rand((1, 2, l, d), 90 + i) for i in range(3))
    seg = jnp.zeros((1, l), jnp.int32)   # ONE segment: needs all 2 blocks
    with pytest.raises(ValueError, match="seg_max_kv_blocks"):
        flash_attention(q, k, v, segment_ids=(seg, seg), block_q=128,
                        block_k=128, interpret=INTERPRET,
                        seg_max_kv_blocks=1)
    bias = _rand((1, 1, l, l), 94)
    with pytest.raises(ValueError, match="bias"):
        flash_attention(q, k, v, bias=bias, segment_ids=(seg, seg),
                        block_q=128, block_k=128, interpret=INTERPRET,
                        seg_max_kv_blocks=2)


def test_seg_block_bounds_and_skip_logic():
    """The skip predicate's inputs: per-block [min,max] id bounds from
    _seg_inputs, and range-overlap semantics of _seg_block_run."""
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        _seg_block_run, _seg_inputs)

    # 2 blocks of 128: ids 0…0|0…1 — bounds [[0,0],[0,1]]; 120 real kv
    # tokens then 8 pad (−1): kv block1 bounds [[−1,1]]
    q_ids = jnp.concatenate([jnp.zeros(192, jnp.int32),
                             jnp.ones(64, jnp.int32)])[None]
    kv_ids = q_ids[:, :248]
    args = _seg_inputs((q_ids, kv_ids), b=1, h=2, lq=256, lk=248,
                       block_q=128, block_k=128)
    q_bounds, kv_bounds = args[2], args[3]
    assert q_bounds.shape == (1, 2, 2) and kv_bounds.shape == (1, 2, 2)
    np.testing.assert_array_equal(np.asarray(q_bounds),
                                  [[[0, 0], [0, 1]]])
    np.testing.assert_array_equal(np.asarray(kv_bounds),
                                  [[[0, 0], [-1, 1]]])
    # disjoint ranges skip; overlapping ranges run
    qb = jnp.asarray([[[0, 0], [2, 3]]])
    kb = jnp.asarray([[[1, 1], [3, 5]]])
    assert not bool(_seg_block_run(qb, kb, 0, 0, 0))   # [0,0] vs [1,1]
    assert bool(_seg_block_run(qb, kb, 0, 1, 1))       # [2,3] vs [3,5]
    assert not bool(_seg_block_run(qb, kb, 0, 0, 1))   # [0,0] vs [3,5]


def test_flash_ragged_via_segment_ids():
    """Per-example ragged lengths: pad tokens get id −1 (matches nothing
    real); valid region ≡ unpadded attention."""
    lens = [100, 77]
    l, d = 128, 32
    q, k, v = (_rand((2, 2, l, d), 60 + i) for i in range(3))
    seg = jnp.stack([
        jnp.where(jnp.arange(l) < n, 0, -1) for n in lens]).astype(jnp.int32)
    got = flash_attention(q, k, v, segment_ids=(seg, seg),
                          block_q=128, block_k=128, interpret=INTERPRET)
    for i, n in enumerate(lens):
        want = _xla_attention(q[i:i+1, :, :n], k[i:i+1, :, :n],
                              v[i:i+1, :, :n], None, False, d**-0.5)
        np.testing.assert_allclose(np.asarray(got[i:i+1, :, :n]),
                                   np.asarray(want), atol=2e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# Position-masked ring-hop primitives (direct unit tests; ring integration
# is covered in test_ring_attention.py, Mosaic lowering in the tpu tier)
# --------------------------------------------------------------------------
def _pos_oracle(q, k, v, q_pos, kv_pos, scale, causal, valid_len):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    mask = jnp.ones((q.shape[2], k.shape[2]), bool)
    if valid_len is not None:
        mask &= (kv_pos[None, :] < valid_len)
    if causal:
        mask &= (kv_pos[None, :] <= q_pos[:, None])
    logits = jnp.where(mask[None, None], logits, -1e30)
    m = jnp.max(logits, -1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, -1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p / jnp.where(l == 0, 1, l), v)
    return out, (m + jnp.log(jnp.where(l == 0, 1, l)))[..., 0]


@pytest.mark.parametrize("causal,valid_len", [(True, None), (False, 200),
                                              (True, 200)])
def test_flash_attention_pos_two_segments(causal, valid_len):
    """Two-segment global offsets (the zig-zag chunk layout) must match an
    explicit-position oracle, output AND lse."""
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        flash_attention_pos)

    l, seg, d = 128, 64, 32
    q, k, v = (_rand((1, 2, l, d), 70 + i) for i in range(3))
    # local block = global chunks [256..320) and [448..512)
    q_off = jnp.asarray([256, 448], jnp.int32)
    kv_off = jnp.asarray([64, 384], jnp.int32)
    pos_of = lambda off: jnp.concatenate(
        [off[0] + jnp.arange(seg), off[1] + jnp.arange(seg)])
    out, lse = flash_attention_pos(
        q, k, v, q_off, kv_off, causal=causal, seg_q=seg, seg_k=seg,
        valid_len=valid_len, block_q=128, block_k=128, interpret=INTERPRET)
    want, want_lse = _pos_oracle(q, k, v, pos_of(q_off), pos_of(kv_off),
                                 d**-0.5, causal, valid_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    rows = np.isfinite(np.asarray(want_lse)) & (np.asarray(want_lse) > -1e29)
    np.testing.assert_allclose(np.asarray(lse)[rows],
                               np.asarray(want_lse)[rows], atol=2e-5)


def test_flash_bwd_pos_matches_autodiff_oracle():
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        flash_attention_pos, flash_bwd_pos)

    l, seg, d = 128, 64, 32
    q, k, v = (_rand((1, 2, l, d), 80 + i) for i in range(3))
    g = _rand((1, 2, l, d), 83)
    # kv covers the earliest positions so every causal q row sees >=1 key
    # (fully-masked rows are a ring-merge concern, not a single-hop one —
    # the dense softmax oracle diverges there by construction)
    q_off = jnp.asarray([64, 128], jnp.int32)
    kv_off = jnp.asarray([0, 192], jnp.int32)
    pos_of = lambda off: jnp.concatenate(
        [off[0] + jnp.arange(seg), off[1] + jnp.arange(seg)])
    out, lse = flash_attention_pos(
        q, k, v, q_off, kv_off, causal=True, seg_q=seg, seg_k=seg,
        block_q=128, block_k=128, interpret=INTERPRET)
    delta = jnp.sum(g * out, axis=-1)
    dq, dk, dv = flash_bwd_pos(
        q, k, v, g, lse, delta, q_off, kv_off, causal=True, seg_q=seg,
        seg_k=seg, block_q=128, block_k=128, interpret=INTERPRET)

    def f(q, k, v):
        o, _ = _pos_oracle(q, k, v, pos_of(q_off), pos_of(kv_off),
                           d**-0.5, True, None)
        return (o * g).sum()

    want = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip((dq, dk, dv), want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


@pytest.mark.parametrize("lc,lx", [(26, 256), (154, 512)])
def test_joint_flash_attention_exact(lc, lx):
    """Split-KV joint attention (4 lse-merged calls) ≡ flash over the
    concatenated sequence — fwd and grads, at misaligned context lengths
    (the SD3 154+4096 shape class)."""
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        joint_flash_attention)

    b, h, d = 2, 3, 32
    qc, kc, vc = (_rand((b, h, lc, d), 40 + i) for i in range(3))
    qx, kx, vx = (_rand((b, h, lx, d), 44 + i) for i in range(3))
    cot_c = _rand((b, h, lc, d), 48)
    cot_x = _rand((b, h, lx, d), 49)

    def f(qc, kc, vc, qx, kx, vx):
        oc, ox = joint_flash_attention(qc, kc, vc, qx, kx, vx, d ** -0.5,
                                       block_q=128, block_k=128,
                                       interpret=INTERPRET)
        return (oc * cot_c).sum() + (ox * cot_x).sum()

    def f_ref(qc, kc, vc, qx, kx, vx):
        q, k, v = (jnp.concatenate(ab, axis=2)
                   for ab in ((qc, qx), (kc, kx), (vc, vx)))
        out = _xla_attention(q, k, v, None, False, d ** -0.5)
        return (out[:, :, :lc] * cot_c).sum() + (out[:, :, lc:] * cot_x).sum()

    np.testing.assert_allclose(float(f(qc, kc, vc, qx, kx, vx)),
                               float(f_ref(qc, kc, vc, qx, kx, vx)),
                               rtol=2e-4)
    got = jax.grad(f, argnums=tuple(range(6)))(qc, kc, vc, qx, kx, vx)
    want = jax.grad(f_ref, argnums=tuple(range(6)))(qc, kc, vc, qx, kx, vx)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("d", [32, 128])
def test_bounded_stability_matches_online(d):
    """stability="bounded" (fixed-max softmax — the qk-norm fast path,
    tools/probe_fixed_max.py) ≡ the online-softmax kernel: fwd, lse
    (incl. masked key tails and fully-masked rows), and grads through
    joint_flash_attention. d=32 exercises the MXU ones-column rowsum,
    d=128 the VPU l-scratch branch."""
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        NEG_INF, flash_attention_pos, joint_flash_attention)

    l = 256
    q, k, v = (_rand((1, 2, l, d), 90 + i) * 0.5 for i in range(3))
    z = jnp.zeros((2,), jnp.int32)
    kw = dict(block_q=128, block_k=128, interpret=INTERPRET)
    o0, l0 = flash_attention_pos(q, k, v, z, z, valid_len=200, **kw)
    o1, l1 = flash_attention_pos(q, k, v, z, z, valid_len=200,
                                 stability="bounded", **kw)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=2e-5)

    # fully-masked rows keep the NEG_INF "no contribution" convention
    _, l_masked = flash_attention_pos(q, k, v, z, z, valid_len=0,
                                      stability="bounded", **kw)
    assert float(np.asarray(l_masked).max()) <= NEG_INF

    cot = _rand((1, 2, l, d), 95)

    def f(stability):
        def inner(qc, kc, vc, qx, kx, vx):
            oc, ox = joint_flash_attention(qc, kc, vc, qx, kx, vx,
                                           d ** -0.5, 128, 128, INTERPRET,
                                           stability)
            return (oc * cot[:, :, :l]).sum() + (ox * cot).sum()
        return inner

    qc, kc, vc = (a * 1.0 for a in (q, k, v))
    qx, kx, vx = (_rand((1, 2, l, d), 96 + i) * 0.5 for i in range(3))
    args = (qc, kc, vc, qx, kx, vx)
    got = jax.grad(f("bounded"), argnums=tuple(range(6)))(*args)
    want = jax.grad(f("online"), argnums=tuple(range(6)))(*args)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("b,h,lq,lk,d", [
    (1, 2, 512, 512, 40),     # SD1 @64² head_dim, non-pow2 scale
    (1, 2, 640, 300, 80),     # unaligned lq AND lk (padded-K masking)
    (1, 1, 512, 512, 64),     # pow2 scale -> host-side q prescale
])
def test_wide_single_pass_matches_xla(b, h, lq, lk, d):
    """The single-pass whole-KV forward (_flash_fwd_wide, auto-routed for
    small-d VMEM-fit shapes) ≡ XLA attention, fwd and grads (the VJP pairs
    the wide fwd's (out, lse) residuals with the online bwd kernels)."""
    import from_ddpm_to_stable_diffusion_tpu.ops.flash_attention as fa

    q = _rand((b, h, lq, d), 10) * 0.7
    k = _rand((b, h, lk, d), 11) * 0.7
    v = _rand((b, h, lk, d), 12)
    orig_min = fa._WIDE_MIN_LQ
    fa._WIDE_MIN_LQ = 512   # keep interpret-mode shapes small
    try:
        assert fa._wide_eligible(lq, lk, d, q.dtype, False, False, False)
        got = flash_attention(q, k, v, interpret=INTERPRET)
        want = _xla_attention(q, k, v, None, False, d ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

        cot = _rand((b, h, lq, d), 13)
        f = lambda *a: (flash_attention(*a, interpret=INTERPRET)
                        * cot).sum()
        fx = lambda *a: (_xla_attention(*a, None, False,
                                        d ** -0.5) * cot).sum()
        got_g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        want_g = jax.grad(fx, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._WIDE_MIN_LQ = orig_min
    for g, w in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=3e-4, rtol=1e-3)


def test_wide_single_pass_matches_online_kernel():
    """Wide path ≡ the online-softmax kernel it replaces (out AND lse —
    the lse contract feeds the backward kernels and ring merges)."""
    import from_ddpm_to_stable_diffusion_tpu.ops.flash_attention as fa

    q, k, v = (_rand((1, 2, 512, 40), 20 + i) for i in range(3))
    wide = fa._flash_fwd_wide(q, k, v, 40 ** -0.5, interpret=INTERPRET)
    orig = fa._wide_enabled
    fa._wide_enabled = False
    try:
        online = fa._flash_fwd(q, k, v, None, None, False, 40 ** -0.5,
                               128, 128, interpret=INTERPRET)
    finally:
        fa._wide_enabled = orig
    np.testing.assert_allclose(np.asarray(wide[0]), np.asarray(online[0]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(wide[1]), np.asarray(online[1]),
                               atol=2e-5, rtol=1e-4)
