"""Pipeline-parallel exactness tests on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
from from_ddpm_to_stable_diffusion_tpu.parallel.pipeline import pipeline_apply


def _stage_fn(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def _make(n_stages, d, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((n_stages, d, d)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((n_stages, d)) * 0.1, jnp.float32)
    return (w, b)


def _sequential(params, x):
    w, b = params
    for i in range(w.shape[0]):
        x = _stage_fn((w[i], b[i]), x)
    return x


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (4, 8), (8, 8), (2, 6)])
def test_pipeline_matches_sequential(devices8, n_stages, n_micro):
    mesh = build_mesh({"stage": n_stages}, devices8[:n_stages])
    params = _make(n_stages, d=16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((n_micro * 2, 16)),
                    jnp.float32)
    got = pipeline_apply(_stage_fn, params, x, mesh, n_microbatches=n_micro)
    want = _sequential(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipeline_rejects_bad_microbatching(devices8):
    mesh = build_mesh({"stage": 4}, devices8[:4])
    params = _make(4, d=8)
    x = jnp.zeros((6, 8))
    with pytest.raises(AssertionError):
        pipeline_apply(_stage_fn, params, x, mesh, n_microbatches=4)
