"""TinyUNet shape/param tests (mirrors 06_.../01_check.py:63-72 assertions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.models.tiny_unet import TinyUNet

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


@pytest.fixture(scope="module")
def tiny():
    model = TinyUNet(out_channels=3, base_channels=32, channel_mult=(1, 2, 2, 2),
                     num_classes=3, num_heads=4)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.ones((2,), jnp.int32)
    params = model.init(jax.random.key(0), x, t, y)
    return model, params


def test_output_shape_matches_input(tiny):
    model, params = tiny
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    out = model.apply(params, x, jnp.asarray([5, 900]), jnp.asarray([1, 3]))
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_label_zero_is_null_embedding(tiny):
    """CFG contract: label 0 must route through a zero embedding row."""
    model, params = tiny
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 3))
    t = jnp.asarray([10])
    out0 = model.apply(params, x, t, jnp.asarray([0]))
    out1 = model.apply(params, x, t, jnp.asarray([1]))
    # different labels give different outputs; label 0 is the uncond branch
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 0


def test_jit_and_grad(tiny):
    model, params = tiny

    @jax.jit
    def loss_fn(p, x, t, y):
        return jnp.mean(model.apply(p, x, t, y) ** 2)

    x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3))
    g = jax.grad(loss_fn)(params, x, jnp.asarray([1]), jnp.asarray([2]))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # gradient reaches the input conv
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_bf16_compute():
    model = TinyUNet(base_channels=32, num_classes=3, num_heads=4,
                     dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
                        jnp.ones((1,), jnp.int32))
    out = model.apply(params, x, jnp.asarray([3]), jnp.asarray([1]))
    assert out.dtype == jnp.float32  # fp32 head contract
    assert out.shape == x.shape
