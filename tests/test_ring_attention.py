"""Ring / Ulysses attention exactness tests on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.ops.attention import _xla_attention
from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
from from_ddpm_to_stable_diffusion_tpu.parallel.ring_attention import (
    ring_attention, ulysses_attention)
from from_ddpm_to_stable_diffusion_tpu.parallel.sharding import (
    tp_spec_for_path, tp_shardings)

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def _qkv(b=1, h=8, l=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
                 for _ in range(3))


def test_ring_attention_exact(devices8):
    mesh = build_mesh({"seq": 8}, devices8)
    q, k, v = _qkv()
    got = ring_attention(q, k, v, mesh, axis="seq")
    want = _xla_attention(q, k, v, None, False, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_attention_2dev_subset(devices8):
    mesh = build_mesh({"seq": 2}, devices8[:2])
    q, k, v = _qkv(l=32, seed=1)
    got = ring_attention(q, k, v, mesh, axis="seq")
    want = _xla_attention(q, k, v, None, False, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ulysses_attention_exact(devices8):
    mesh = build_mesh({"seq": 8}, devices8)
    q, k, v = _qkv(seed=2)
    got = ulysses_attention(q, k, v, mesh, axis="seq")
    want = _xla_attention(q, k, v, None, False, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ulysses_rejects_bad_head_count(devices8):
    mesh = build_mesh({"seq": 8}, devices8)
    q, k, v = _qkv(h=4)
    with pytest.raises(AssertionError):
        ulysses_attention(q, k, v, mesh, axis="seq")


def test_ring_attention_grad(devices8):
    """Differentiable end-to-end (used inside training steps)."""
    mesh = build_mesh({"seq": 8}, devices8)
    q, k, v = _qkv(l=32, seed=3)

    def f(q, k, v):
        return ring_attention(q, k, v, mesh, axis="seq").sum()

    def g(q, k, v):
        return _xla_attention(q, k, v, None, False, 16**-0.5).sum()

    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_tp_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert tp_spec_for_path("enc1_att/attn1/qkv/kernel") == P(None, "model")
    assert tp_spec_for_path("enc1_att/attn1/out/kernel") == P("model", None)
    assert tp_spec_for_path("enc1_att/geglu_in/kernel") == P(None, "model")
    assert tp_spec_for_path("enc1_att/geglu_out/kernel") == P("model", None)
    assert tp_spec_for_path("joint_block0/x_block/mlp_fc1/kernel") == P(None, "model")
    assert tp_spec_for_path("joint_block0/x_block/proj/kernel") == P("model", None)
    assert tp_spec_for_path("block0/attn/q/kernel") == P(None, "model")
    assert tp_spec_for_path("block0/attn/o/kernel") == P("model", None)
    assert tp_spec_for_path("enc0_conv/kernel") == P()
    assert tp_spec_for_path("norm1/scale") == P()


def test_tp_sharded_forward_matches_single_device(devices8):
    """TinyUNet forward under a data×model mesh must equal 1-device run."""
    from from_ddpm_to_stable_diffusion_tpu.models.tiny_unet import TinyUNet

    model = TinyUNet(base_channels=32, num_classes=3, num_heads=4)
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 3))
    t = jnp.asarray([1, 5, 9, 20])
    y = jnp.asarray([1, 2, 3, 1])
    params = model.init(jax.random.key(1), x, t, y)["params"]
    want = model.apply({"params": params}, x, t, y)

    mesh = build_mesh({"data": 4, "model": 2}, devices8)
    sharded = jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh))
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    got = jax.jit(lambda p, x, t, y: model.apply({"params": p}, x, t, y))(
        sharded, xs, t, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_tp_sharded_mmdit_forward_matches_single_device(devices8):
    """TP over the MMDiT joint blocks must be exact (GSPMD collectives)."""
    import jax.numpy as jnp

    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=2, pos_embed_max_size=8)
    model = MMDiT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    t = jnp.asarray([100.0, 500.0])
    y = jax.random.normal(jax.random.key(1), (2, 2048))
    ctx = jax.random.normal(jax.random.key(2), (2, 154, 4096))
    params = model.init(jax.random.key(3), x, t, y, ctx)["params"]
    want = model.apply({"params": params}, x, t, y, ctx)

    mesh = build_mesh({"data": 2, "model": 4}, devices8)
    sharded = jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh))
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, x: model.apply({"params": p}, x, t, y, ctx))(
        sharded, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_ring_attention_ragged_kv_mask(devices8):
    """Padded sequences: kv_valid_len masks padded keys exactly."""
    mesh = build_mesh({"seq": 8}, devices8)
    rng = np.random.default_rng(5)
    l_valid, l_pad = 50, 64  # 64 divides over 8 devices; 14 padded keys
    q = jnp.asarray(rng.standard_normal((1, 2, l_pad, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, l_pad, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, l_pad, 16)), jnp.float32)
    got = ring_attention(q, k, v, mesh, axis="seq", kv_valid_len=l_valid)
    want = _xla_attention(q[:, :, :], k[:, :, :l_valid], v[:, :, :l_valid],
                          None, False, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got[:, :, :l_valid]),
                               np.asarray(want[:, :, :l_valid]), atol=2e-5)


def test_mmdit_ring_attention_matches_flash(devices8):
    """MMDiT with sequence-parallel ring attention == single-device MMDiT."""
    import dataclasses

    import jax.numpy as jnp

    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=2, pos_embed_max_size=8)
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    t = jnp.asarray([300.0])
    y = jax.random.normal(jax.random.key(1), (1, 2048))
    ctx = jax.random.normal(jax.random.key(2), (1, 154, 4096))
    base = MMDiT(cfg)
    params = base.init(jax.random.key(3), x, t, y, ctx)["params"]
    want = base.apply({"params": params}, x, t, y, ctx)

    mesh = build_mesh({"seq": 8}, devices8)
    ring_cfg = dataclasses.replace(cfg, attention_impl="ring")
    ring_model = MMDiT(ring_cfg, mesh=mesh)
    # joint seq = 154 + 16 = 170, padded to 176 over 8 devices
    got = ring_model.apply({"params": params}, x, t, y, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_ring_attention_causal_zigzag_exact(devices8):
    """Causal ring (zig-zag layout) ≡ single-device causal attention."""
    mesh = build_mesh({"seq": 4}, devices8[:4])
    q, k, v = _qkv(l=64, seed=11)
    got = ring_attention(q, k, v, mesh, axis="seq", causal=True)
    want = _xla_attention(q, k, v, None, True, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_attention_causal_grad(devices8):
    mesh = build_mesh({"seq": 4}, devices8[:4])
    q, k, v = _qkv(l=32, h=2, seed=12)

    g1 = jax.grad(lambda q: ring_attention(q, k, v, mesh, axis="seq",
                                           causal=True).sum())(q)
    g2 = jax.grad(lambda q: _xla_attention(q, k, v, None, True,
                                           16**-0.5).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_zigzag_order_balances_causal_work():
    """Each device's total visible (causal) kv pairs must be equal under
    the zig-zag layout — the point of the reordering."""
    from from_ddpm_to_stable_diffusion_tpu.parallel.ring_attention import (
        zigzag_order)

    l, n = 64, 4
    perm, inv = zigzag_order(l, n)
    perm = np.asarray(perm)
    assert sorted(perm.tolist()) == list(range(l))
    assert np.array_equal(np.asarray(inv)[perm], np.arange(l))
    block = l // n
    work = []
    for dev in range(n):
        q_pos = perm[dev * block:(dev + 1) * block]
        # over the full ring, every device sees all kv positions once
        work.append(int((np.arange(l)[None, :] <= q_pos[:, None]).sum()))
    assert len(set(work)) == 1, f"unbalanced causal work: {work}"


def test_ring_flash_exact(devices8):
    """Pallas per-hop flash ring (interpret mode) ≡ full attention."""
    mesh = build_mesh({"seq": 8}, devices8)
    q, k, v = _qkv(l=128, seed=21)
    got = ring_attention(q, k, v, mesh, axis="seq", impl="flash",
                         interpret=True)
    want = _xla_attention(q, k, v, None, False, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_flash_causal_zigzag_exact(devices8):
    mesh = build_mesh({"seq": 4}, devices8[:4])
    q, k, v = _qkv(l=64, seed=22)
    got = ring_attention(q, k, v, mesh, axis="seq", causal=True,
                         impl="flash", interpret=True)
    want = _xla_attention(q, k, v, None, True, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_flash_ragged_kv_mask(devices8):
    mesh = build_mesh({"seq": 8}, devices8)
    rng = np.random.default_rng(23)
    l_valid, l_pad = 50, 64
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, l_pad, 16)),
                           jnp.float32) for _ in range(3))
    got = ring_attention(q, k, v, mesh, axis="seq", kv_valid_len=l_valid,
                         impl="flash", interpret=True)
    want = _xla_attention(q, k[:, :, :l_valid], v[:, :, :l_valid],
                          None, False, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got[:, :, :l_valid]),
                               np.asarray(want[:, :, :l_valid]), atol=2e-5)


def test_ring_flash_grads(devices8):
    """Custom-VJP ring backward (rotating Pallas accumulators) ≡ oracle."""
    mesh = build_mesh({"seq": 8}, devices8)
    q, k, v = _qkv(l=64, h=2, seed=24)

    def f(q, k, v):
        return (ring_attention(q, k, v, mesh, axis="seq", impl="flash",
                               interpret=True) * cot).sum()

    def g(q, k, v):
        return (_xla_attention(q, k, v, None, False, 16**-0.5) * cot).sum()

    cot = jnp.asarray(
        np.random.default_rng(25).standard_normal(q.shape), jnp.float32)
    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ring_flash_causal_grads(devices8):
    mesh = build_mesh({"seq": 4}, devices8[:4])
    q, k, v = _qkv(l=64, h=2, seed=26)

    def f(q, k, v):
        return ring_attention(q, k, v, mesh, axis="seq", causal=True,
                              impl="flash", interpret=True).sum()

    def g(q, k, v):
        return _xla_attention(q, k, v, None, True, 16**-0.5).sum()

    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ring_flash_long_sequence_16k(devices8):
    """The regime ring exists for: L=16k over 8 devices, flash per-hop
    primitive — memory per hop is O(block²) VMEM, logits never
    materialized.  Exactness + grad vs a blockwise lse-merge oracle."""
    mesh = build_mesh({"seq": 8}, devices8)
    l = 16384
    rng = np.random.default_rng(27)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 1, l, 64)) * 0.3,
                           jnp.float32) for _ in range(3))
    got = ring_attention(q, k, v, mesh, axis="seq", impl="flash",
                         interpret=True)
    want = _xla_attention(q, k, v, None, False, 64**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    # one grad probe (dq only, summed cotangent) to keep runtime bounded
    g1 = jax.grad(lambda q: ring_attention(
        q, k, v, mesh, axis="seq", impl="flash", interpret=True).sum())(q)
    g2 = jax.grad(lambda q: _xla_attention(
        q, k, v, None, False, 64**-0.5).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_ulysses_ragged_kv_mask(devices8):
    """Ulysses with kv_valid_len must mask padded keys exactly."""
    mesh = build_mesh({"seq": 4}, devices8[:4])
    rng = np.random.default_rng(6)
    l_valid, l_pad = 50, 64
    q = jnp.asarray(rng.standard_normal((1, 4, l_pad, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 4, l_pad, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 4, l_pad, 16)), jnp.float32)
    got = ulysses_attention(q, k, v, mesh, axis="seq", kv_valid_len=l_valid)
    want = _xla_attention(q, k[:, :, :l_valid], v[:, :, :l_valid],
                          None, False, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got[:, :, :l_valid]),
                               np.asarray(want[:, :, :l_valid]), atol=2e-5)


def test_mmdit_ulysses_attention_matches_flash(devices8):
    """MMDiT with Ulysses sequence parallelism == single-device MMDiT."""
    import dataclasses

    import jax.numpy as jnp

    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=2, pos_embed_max_size=8)
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    t = jnp.asarray([300.0])
    y = jax.random.normal(jax.random.key(1), (1, 2048))
    ctx = jax.random.normal(jax.random.key(2), (1, 154, 4096))
    base = MMDiT(cfg)
    params = base.init(jax.random.key(3), x, t, y, ctx)["params"]
    want = base.apply({"params": params}, x, t, y, ctx)

    # heads = depth = 2 -> 2-way Ulysses (heads % n == 0)
    mesh = build_mesh({"seq": 2}, devices8[:2])
    uly_cfg = dataclasses.replace(cfg, attention_impl="ulysses")
    uly_model = MMDiT(uly_cfg, mesh=mesh)
    got = uly_model.apply({"params": params}, x, t, y, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)
