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


# --------------------------------------------------------------------------
# Sparse MMDiT: SwitchFFN as the x-stream block MLP (EP in a real model)
# --------------------------------------------------------------------------
def _moe_mmdit(experts=4, mesh=None):
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=2, in_channels=4, adm_in_channels=8,
                      context_dim=16, pos_embed_max_size=8,
                      moe_experts=experts)
    return MMDiT(cfg, mesh=mesh)


def _moe_inputs():
    kx, kt, ky, kc = jax.random.split(jax.random.key(11), 4)
    x = jax.random.normal(kx, (2, 8, 8, 4))
    t = jnp.asarray([100.0, 500.0])
    y = jax.random.normal(ky, (2, 8))
    ctx = jax.random.normal(kc, (2, 6, 16))
    return x, t, y, ctx


def test_moe_mmdit_structure_and_forward():
    """MoE MMDiT: x-stream blocks carry (E, ...) expert tensors, the
    154-token context stream stays dense, forward is finite, and the aux
    balance losses sow into the 'losses' collection."""
    model = _moe_mmdit()
    x, t, y, ctx = _moe_inputs()
    params = model.init(jax.random.key(0), x, t, y, ctx)["params"]
    xb = params["joint_block0"]["x_block"]
    assert "moe" in xb and xb["moe"]["wi"].shape[0] == 4
    assert "mlp_fc1" not in xb
    assert "mlp_fc1" in params["joint_block0"]["context_block"]

    out, mut = model.apply({"params": params}, x, t, y, ctx,
                           mutable=["losses"])
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    auxes = jax.tree_util.tree_leaves(mut["losses"])
    assert len(auxes) == 2  # one per x-stream block
    assert all(float(a) > 0 for a in auxes)
    # inference path (immutable collections): sow is a no-op, no error
    out2 = model.apply({"params": params}, x, t, y, ctx)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out))


def test_moe_mmdit_expert_parallel_matches_single_device(devices8):
    """The same MoE MMDiT over an 8-way 'expert' mesh == single device
    (dispatch all_to_all + local expert FFNs are exact)."""
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh

    x, t, y, ctx = _moe_inputs()
    single = _moe_mmdit(experts=8)
    params = single.init(jax.random.key(0), x, t, y, ctx)["params"]
    want = single.apply({"params": params}, x, t, y, ctx)

    mesh = build_mesh({"expert": 8}, devices8)
    sharded = _moe_mmdit(experts=8, mesh=mesh)
    got = jax.jit(lambda p: sharded.apply({"params": p}, x, t, y, ctx))(
        params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_moe_mmdit_training_learns(devices8):
    """Rectified-flow training of the sparse MMDiT: velocity loss + aux
    balance loss both flow; loss decreases."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import MMDiTConfig
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
    from from_ddpm_to_stable_diffusion_tpu.pipelines.mmdit_trainer import (
        MMDiTTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.config import (
        FlowTrainConfig)

    mcfg = MMDiTConfig(depth=2, in_channels=4, adm_in_channels=8,
                       context_dim=16, pos_embed_max_size=8,
                       moe_experts=4)
    cfg = FlowTrainConfig(epoch=5, batch_size=8, img_size=8, context_len=4,
                          lr=1e-4, max_lr=3e-3, warmup_epochs=1,
                          train_rand=0.1, sample_steps=3, w=2.0,
                          dtype="fp32", seed=0)
    trainer = MMDiTTrainer(mcfg, cfg, mesh=build_mesh({"data": 8},
                                                      jax.devices()[:8]))
    state = trainer.create_state(steps_per_epoch=8)
    r = np.random.default_rng(0)
    latents = r.normal(size=(8, 8, 8, 4)).astype(np.float32)
    ctx = r.normal(size=(8, 4, 16)).astype(np.float32)
    y = r.normal(size=(8, 8)).astype(np.float32)
    rng = jax.random.key(3)
    losses = []
    for _ in range(40):
        state, loss = trainer.train_step(state, latents, ctx, y, rng)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:5])
