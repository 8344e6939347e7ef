"""Expert-parallel Switch MoE tests (fake 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
from from_ddpm_to_stable_diffusion_tpu.parallel.expert import SwitchFFN

pytestmark = pytest.mark.slow


def _init(e=4, c=16, b=2, l=12, capacity_factor=8.0, seed=0):
    model = SwitchFFN(num_experts=e, hidden_mult=2,
                      capacity_factor=capacity_factor)
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, l, c)), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    return model, params, x


def test_switch_ffn_matches_per_token_reference():
    """With capacity >> tokens (no drops), the one-hot dispatch must equal
    routing each token through its argmax expert scaled by its prob."""
    model, params, x = _init()
    out, aux = model.apply({"params": params}, x)

    logits = x @ params["router"]["kernel"] + params["router"]["bias"]
    probs = jax.nn.softmax(logits, axis=-1)
    choice = jnp.argmax(probs, axis=-1)
    gate = jnp.max(probs, axis=-1)
    wi, wg, wo = (params[k] for k in ("wi", "wg", "wo"))

    def one_token(xv, e_idx, g):
        up = xv @ wi[e_idx]
        gv = xv @ wg[e_idx]
        return (jax.nn.silu(gv) * up) @ wo[e_idx] * g

    want = jax.vmap(jax.vmap(one_token))(x, choice, gate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert float(aux) > 0


def test_switch_ffn_expert_parallel_matches_single_device(devices8):
    model, params, x = _init(e=8, b=2, l=16)
    ref, _ = model.apply({"params": params}, x)
    mesh = build_mesh({"expert": 4}, jax.devices()[:4])
    got, _ = model.apply({"params": params}, x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_switch_ffn_capacity_drops_to_zero():
    """Tokens over a tiny capacity must pass through as exact zeros (the
    caller's residual path)."""
    model, params, x = _init(e=2, b=1, l=16, capacity_factor=0.125)
    # capacity = int(0.125 * 16 / 2 + 1) = 2 slots per expert
    out, _ = model.apply({"params": params}, x)
    zero_rows = np.all(np.asarray(out[0]) == 0.0, axis=-1)
    assert zero_rows.sum() >= 16 - 2 * 2, zero_rows
    assert (~zero_rows).sum() >= 1


def test_switch_ffn_grads_flow():
    model, params, x = _init()

    def loss(p):
        out, aux = model.apply({"params": p}, x)
        return jnp.sum(out**2) + 0.01 * aux

    grads = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(g))
             for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms)) and max(norms) > 0


def test_switch_ffn_data_expert_mesh(devices8):
    """x sharded on batch over a mixed data×expert mesh must be exact:
    routing/dispatch run outside shard_map (GSPMD shards them on ``data``
    and reshards the expert inboxes over ``expert``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, params, x = _init(e=4, b=4, l=16)
    ref, _ = model.apply({"params": params}, x)
    mesh = build_mesh({"data": 2, "expert": 4}, devices8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    got, _ = jax.jit(
        lambda p, x: model.apply({"params": p}, x, mesh=mesh))(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
