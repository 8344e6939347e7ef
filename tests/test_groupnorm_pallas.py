"""Fused GroupNorm kernel + custom-VJP tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.ops.groupnorm import (
    _group_norm_xla, group_norm)
from from_ddpm_to_stable_diffusion_tpu.ops.groupnorm_pallas import (
    group_norm_pallas)

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines

INTERPRET = jax.default_backend() != "tpu"


def _inputs(b=2, h=6, w=5, c=64, groups=8, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32),
            jnp.asarray(rng.standard_normal(c), jnp.float32),
            jnp.asarray(rng.standard_normal(c), jnp.float32),
            groups)


@pytest.mark.parametrize("act", [None, "silu"])
def test_pallas_kernel_matches_xla(act):
    x, s, b, g = _inputs()
    got = group_norm_pallas(x, g, s, b, act=act, interpret=INTERPRET)
    want = _group_norm_xla(x, g, s, b, 1e-5, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_kernel_unaligned_channels():
    # C=320 (not a lane multiple) exercises the one-hot group matmuls
    x, s, b, g = _inputs(c=320, groups=32, seed=1)
    got = group_norm_pallas(x, g, s, b, interpret=INTERPRET)
    want = _group_norm_xla(x, g, s, b, 1e-5, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("act", [None, "silu"])
def test_custom_vjp_matches_autodiff(act):
    """Analytic backward must equal autodiff of the XLA reference."""
    from from_ddpm_to_stable_diffusion_tpu.ops.groupnorm import _group_norm_fused

    x, s, b, g = _inputs(b=1, h=4, w=4, c=32, groups=4, seed=2)

    if INTERPRET:
        # route the fused fwd through the interpreter on CPU
        import from_ddpm_to_stable_diffusion_tpu.ops.groupnorm_pallas as gp
        orig = gp.group_norm_pallas
        gp.group_norm_pallas = lambda *a, **k: orig(*a, **{**k,
                                                           "interpret": True})
    try:
        def f(x, s, b):
            return jnp.sum(_group_norm_fused(x, s, b, g, 1e-5, act) ** 2)

        def ref(x, s, b):
            return jnp.sum(_group_norm_xla(x, g, s, b, 1e-5, act) ** 2)

        g1 = jax.grad(f, argnums=(0, 1, 2))(x, s, b)
        g2 = jax.grad(ref, argnums=(0, 1, 2))(x, s, b)
        for a_, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       atol=1e-3, rtol=1e-3)
    finally:
        if INTERPRET:
            gp.group_norm_pallas = orig


def test_group_norm_public_dispatch():
    x, s, b, g = _inputs(seed=3)
    out = group_norm(x, g, s, b, use_pallas=False)
    want = _group_norm_xla(x, g, s, b, 1e-5, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
