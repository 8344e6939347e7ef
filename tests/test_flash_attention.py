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
