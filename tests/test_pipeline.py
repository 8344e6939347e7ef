"""Pipeline-parallel exactness tests on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
from from_ddpm_to_stable_diffusion_tpu.parallel.pipeline import (
    make_1f1b_schedule, pipeline_apply, pipeline_value_and_grad)


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


def _loss_fn(y, t):
    return jnp.mean((y - t) ** 2)


def test_1f1b_schedule_properties():
    """Dependencies, one op per stage per tick, and the 1F1B stash bound."""
    for S, M in [(2, 4), (4, 4), (4, 8), (8, 8), (3, 5)]:
        F, Bw = make_1f1b_schedule(S, M)
        f_tick = np.full((S, M), -1)
        b_tick = np.full((S, M), -1)
        for t in range(F.shape[0]):
            for s in range(S):
                assert not (F[t, s] >= 0 and Bw[t, s] >= 0)
                if F[t, s] >= 0:
                    f_tick[s, F[t, s]] = t
                if Bw[t, s] >= 0:
                    b_tick[s, Bw[t, s]] = t
        assert (f_tick >= 0).all() and (b_tick >= 0).all()
        # forward deps: fwd(s,m) strictly after fwd(s-1,m)
        assert (f_tick[1:] > f_tick[:-1]).all()
        # backward deps: bwd(s,m) strictly after bwd(s+1,m), after fwd(s,m)
        assert (b_tick[:-1] > b_tick[1:]).all()
        assert (b_tick > f_tick).all()
        # the 1F1B memory bound: in-flight at stage s never exceeds
        # min(S - s, M)
        for s in range(S):
            events = sorted([(t, +1) for t in f_tick[s]]
                            + [(t, -1) for t in b_tick[s]])
            live = peak = 0
            for _, d in events:
                live += d
                peak = max(peak, live)
            assert peak <= min(S - s, M), (S, M, s, peak)


@pytest.mark.slow
@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (4, 8), (2, 6)])
def test_1f1b_grads_match_sequential(devices8, n_stages, n_micro):
    """Pipelined training step ≡ sequential loss/grads (the PP backward
    contract: stage-partitioned params, grads match single-device)."""
    mesh = build_mesh({"stage": n_stages}, devices8[:n_stages])
    params = _make(n_stages, d=16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((n_micro * 2, 16)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((n_micro * 2, 16)), jnp.float32)

    loss, grads = pipeline_value_and_grad(
        _stage_fn, params, x, tgt, _loss_fn, mesh, n_microbatches=n_micro)

    def seq_loss(params):
        mb = x.shape[0] // n_micro
        micro = x.reshape(n_micro, mb, 16)
        tm = tgt.reshape(n_micro, mb, 16)
        return jnp.mean(jnp.asarray(
            [_loss_fn(_sequential(params, micro[m]), tm[m])
             for m in range(n_micro)]))

    want_loss, want_grads = jax.value_and_grad(seq_loss)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-6)
    for g, w in zip(grads, want_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_pipeline_rejects_bad_microbatching(devices8):
    mesh = build_mesh({"stage": 4}, devices8[:4])
    params = _make(4, d=8)
    x = jnp.zeros((6, 8))
    with pytest.raises(AssertionError):
        pipeline_apply(_stage_fn, params, x, mesh, n_microbatches=4)
