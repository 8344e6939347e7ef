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


# --------------------------------------------------------------------------
# Real-model pipeline: MMDiT joint blocks over the stage axis
# --------------------------------------------------------------------------
def _mmdit_setup(depth=5, seed=0):
    """Small MMDiT + embedded (context, x, c) inputs at batch 8."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=depth, pos_embed_max_size=8)
    model = MMDiT(cfg)
    b, hs = 8, cfg.hidden_size
    rng = np.random.default_rng(seed)
    x_img = jnp.asarray(rng.standard_normal((b, 8, 8, 16)) * 0.3,
                        jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1000, (b,)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, 2048)) * 0.3, jnp.float32)
    ctx_raw = jnp.asarray(rng.standard_normal((b, 20, 4096)) * 0.3,
                          jnp.float32)
    params = model.init(jax.random.key(seed), x_img, t, y, ctx_raw)["params"]
    # embedded inputs to the block stack (what MMDiT.__call__ computes
    # before the joint blocks)
    context = jnp.asarray(
        rng.standard_normal((b, 20, hs)) * 0.3, jnp.float32)
    xe = jnp.asarray(rng.standard_normal((b, 16, hs)) * 0.3, jnp.float32)
    c = jnp.asarray(rng.standard_normal((b, hs)) * 0.3, jnp.float32)
    return cfg, params, context, xe, c


def _sequential_blocks(cfg, params, context, x, c, n_blocks):
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import JointBlock

    blk = JointBlock(cfg.hidden_size, cfg.depth, cfg.mlp_ratio,
                     cfg.qkv_bias, context_pre_only=False,
                     qk_norm=cfg.qk_norm)
    for i in range(n_blocks):
        context, x = blk.apply({"params": params[f"joint_block{i}"]},
                               context, x, c)
    return context, x


@pytest.mark.slow
def test_mmdit_pipelined_blocks_match_sequential(devices8):
    """4 real JointBlocks over 4 pipeline stages ≡ the sequential stack."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        pipelined_joint_blocks)

    cfg, params, context, xe, c = _mmdit_setup(depth=5)
    mesh = build_mesh({"stage": 4}, devices8[:4])
    got_ctx, got_x = pipelined_joint_blocks(cfg, params, context, xe, c,
                                            mesh, n_microbatches=4)
    want_ctx, want_x = _sequential_blocks(cfg, params, context, xe, c, 4)
    np.testing.assert_allclose(np.asarray(got_ctx), np.asarray(want_ctx),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=2e-4)


@pytest.mark.slow
def test_mmdit_pipelined_blocks_multiple_per_stage(devices8):
    """2 stages × 2 blocks each (k=2 grouping)."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        pipelined_joint_blocks)

    cfg, params, context, xe, c = _mmdit_setup(depth=5, seed=3)
    mesh = build_mesh({"stage": 2}, devices8[:2])
    got_ctx, got_x = pipelined_joint_blocks(cfg, params, context, xe, c,
                                            mesh, n_microbatches=4)
    want_ctx, want_x = _sequential_blocks(cfg, params, context, xe, c, 4)
    np.testing.assert_allclose(np.asarray(got_ctx), np.asarray(want_ctx),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=2e-4)


@pytest.mark.slow
def test_mmdit_pipelined_1f1b_grads(devices8):
    """1F1B training step through 2 real JointBlock stages: loss + stacked
    grads ≡ sequential autodiff."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        make_joint_block_stage_fn, stack_joint_block_params)
    from from_ddpm_to_stable_diffusion_tpu.parallel.pipeline import (
        pipeline_value_and_grad)

    cfg, params, context, xe, c = _mmdit_setup(depth=3, seed=5)
    n_blocks, n_stages, n_micro = 2, 2, 4
    mesh = build_mesh({"stage": n_stages}, devices8[:n_stages])
    lc = context.shape[1]
    z = jnp.concatenate([context, xe, c[:, None]], axis=1)
    targets = jnp.asarray(
        np.random.default_rng(6).standard_normal(z.shape) * 0.3, jnp.float32)
    stage_fn = make_joint_block_stage_fn(cfg, lc, k=1)
    sp = stack_joint_block_params(params, n_blocks, n_stages)

    loss, grads = pipeline_value_and_grad(
        stage_fn, sp, z, targets, _loss_fn, mesh, n_micro)

    # sequential oracle over the same stacked params
    def seq_loss(sp):
        out = z
        for s in range(n_stages):
            ps = jax.tree_util.tree_map(lambda p: p[s], sp)
            out = stage_fn(ps, out)
        return _loss_fn(out, targets)

    want_loss, want_grads = jax.value_and_grad(seq_loss)(sp)
    np.testing.assert_allclose(float(loss), float(want_loss), atol=1e-5)
    for g, w in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(want_grads)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)


@pytest.mark.slow
def test_mmdit_pipeline_composes_with_tp(devices8):
    """stage×model mesh: PP over stages with TP-sharded block weights
    inside each stage (GSPMD handles the model axis) stays exact."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        stack_joint_block_params)
    from from_ddpm_to_stable_diffusion_tpu.parallel.sharding import (
        tp_spec_for_path)

    cfg, params, context, xe, c = _mmdit_setup(depth=5, seed=7)
    mesh = build_mesh({"stage": 2, "model": 2}, devices8[:4])

    # shard each block's TP-eligible kernels on the model axis (specs get a
    # leading (stage, k) pair of None dims from the stacking)
    def shard_stacked(path, p):
        names = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = tp_spec_for_path(names)
        full = P("stage", None, *spec)
        try:
            return jax.device_put(p, NamedSharding(mesh, full))
        except ValueError:
            return jax.device_put(p, NamedSharding(mesh, P("stage")))

    sp = stack_joint_block_params(params, 4, 2)
    sp = jax.tree_util.tree_map_with_path(shard_stacked, sp)
    # run through the public helper but with pre-sharded stacked params:
    # re-stack inside would drop the shardings, so drive pipeline_apply
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        make_joint_block_stage_fn)
    from from_ddpm_to_stable_diffusion_tpu.parallel.pipeline import (
        pipeline_apply)

    lc = context.shape[1]
    z = jnp.concatenate([context, xe, c[:, None]], axis=1)
    stage_fn = make_joint_block_stage_fn(cfg, lc, k=2)
    out = pipeline_apply(stage_fn, sp, z, mesh, n_microbatches=4)
    got_ctx, got_x = out[:, :lc], out[:, lc:-1]
    want_ctx, want_x = _sequential_blocks(cfg, params, context, xe, c, 4)
    np.testing.assert_allclose(np.asarray(got_ctx), np.asarray(want_ctx),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=2e-4)


@pytest.mark.slow
def test_mmdit_full_forward_pp_matches_single_device(devices8):
    """END-TO-END: the full MMDiT forward with pipelined joint blocks
    (embeddings → 4 PP stages → pre_only block → head) ≡ MMDiT.apply."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        MMDiT, MMDiTConfig, mmdit_forward_pp)

    cfg = MMDiTConfig(depth=5, pos_embed_max_size=8)
    model = MMDiT(cfg)
    rng = np.random.default_rng(9)
    b = 8
    x = jnp.asarray(rng.standard_normal((b, 8, 8, 16)) * 0.3, jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1000, (b,)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, 2048)) * 0.3, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 20, 4096)) * 0.3, jnp.float32)
    params = model.init(jax.random.key(9), x, t, y, ctx)["params"]
    want = model.apply({"params": params}, x, t, y, ctx)

    mesh = build_mesh({"stage": 4}, devices8[:4])
    got = mmdit_forward_pp(cfg, params, x, t, y, ctx, mesh,
                           n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4)


@pytest.mark.slow
def test_mmdit_full_forward_pp_grads(devices8):
    """Training through the pipelined full forward: autodiff through the
    GPipe shard_map (ppermute transposes to the reverse rotation) must
    equal single-device gradients — full-model PP training, embeddings
    and head included."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        MMDiT, MMDiTConfig, mmdit_forward_pp)

    cfg = MMDiTConfig(depth=3, pos_embed_max_size=8)
    model = MMDiT(cfg)
    rng = np.random.default_rng(11)
    b = 4
    x = jnp.asarray(rng.standard_normal((b, 8, 8, 16)) * 0.3, jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1000, (b,)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, 2048)) * 0.3, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 12, 4096)) * 0.3, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((b, 8, 8, 16)) * 0.3, jnp.float32)
    params = model.init(jax.random.key(11), x, t, y, ctx)["params"]
    mesh = build_mesh({"stage": 2}, devices8[:2])

    def loss_pp(p):
        out = mmdit_forward_pp(cfg, p, x, t, y, ctx, mesh,
                               n_microbatches=2)
        return jnp.mean((out - tgt) ** 2)

    def loss_ref(p):
        out = model.apply({"params": p}, x, t, y, ctx)
        return jnp.mean((out - tgt) ** 2)

    l1, g1 = jax.value_and_grad(loss_pp)(params)
    l2, g2 = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in flat1:
        np.testing.assert_allclose(np.asarray(a), np.asarray(flat2[path]),
                                   atol=3e-4, err_msg=str(path))
