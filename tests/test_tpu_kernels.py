"""Real-TPU kernel tier: Mosaic lowering + compiled numerics on the chip.

Run: ``FDSD_TEST_PLATFORM=axon python -m pytest tests -m tpu -q``

The CPU suite exercises the Pallas kernels through the interpreter, which
cannot catch Mosaic lowering regressions (e.g. the documented BLHD
BlockSpec rejection).  This tier compiles the kernels for the actual chip:
flash fwd/bwd (plain, bias+dbias, segment ids), the position-masked ring
primitives, fused GroupNorm fwd, and a tiny-UNet train step (flash bwd +
GN bwd inside a real grad program).  First run per session pays remote
compiles (~2-4 min total); the persistent cache at /tmp/fdsd_tpu_cache
makes reruns fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype)


def _fetch(x):
    return np.asarray(x)  # host transfer = the only honest sync on axon


def _xla_oracle(q, k, v, bias, causal, scale):
    from from_ddpm_to_stable_diffusion_tpu.ops.attention import (
        _xla_attention)

    return _xla_attention(q, k, v, bias, causal, scale)


def test_flash_fwd_compiles_and_matches():
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        flash_attention)

    q, k, v = (_rand((2, 4, 512, 64), s) for s in (0, 1, 2))
    got = _fetch(jax.jit(lambda q, k, v: flash_attention(
        q, k, v, block_q=256, block_k=256))(q, k, v))
    want = _fetch(jax.jit(_xla_oracle, static_argnums=(4, 5))(
        q, k, v, None, False, 64**-0.5))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_flash_bias_and_segment_grads_compile():
    """bias + segment-id masking and the Pallas dbias backward must LOWER
    and agree with the dense oracle on-chip."""
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        flash_attention)

    l = 256
    q, k, v = (_rand((1, 2, l, 64), s) for s in (3, 4, 5))
    bias = _rand((1, 2, l, l), 6) * 0.3
    seg = jnp.concatenate([jnp.zeros(l // 2, jnp.int32),
                           jnp.ones(l - l // 2, jnp.int32)])[None]

    def f(q, k, v, bias):
        return flash_attention(q, k, v, bias=bias, segment_ids=(seg, seg),
                               block_q=128, block_k=128).sum()

    def g(q, k, v, bias):
        same = (seg[0][:, None] == seg[0][None, :])
        mask = jnp.where(same, 0.0, -1e30)[None, None]
        return _xla_oracle(q, k, v, bias + mask, False, 64**-0.5).sum()

    g1 = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    g2 = jax.jit(jax.grad(g, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(_fetch(a), _fetch(b), atol=3e-3)


def test_flash_seg_hint_remap_compiles():
    """The truncated-grid packed path (seg_max_kv_blocks) — scalar-prefetch
    index maps + remapped k walk — must lower and stay exact on-chip."""
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        flash_attention)

    n_seq, seq_len, d = 8, 256, 64
    l = n_seq * seq_len
    q, k, v = (_rand((1, 2, l, d), s, jnp.bfloat16) for s in (7, 8, 9))
    seg = jnp.repeat(jnp.arange(n_seq, dtype=jnp.int32), seq_len)[None]

    def f(hint):
        def g(q, k, v):
            return flash_attention(
                q, k, v, segment_ids=(seg, seg), block_q=256, block_k=256,
                seg_max_kv_blocks=hint).astype(jnp.float32).sum()
        return g

    got = jax.jit(jax.grad(f(2), argnums=(0, 1, 2)))(q, k, v)
    want = jax.jit(jax.grad(f(None), argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(_fetch(a).astype(np.float32),
                                   _fetch(b).astype(np.float32),
                                   atol=3e-3, rtol=1e-2)


def test_flash_causal_grads_compile():
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        flash_attention)

    q, k, v = (_rand((1, 2, 384, 64), s) for s in (7, 8, 9))
    g1 = jax.jit(jax.grad(lambda q: flash_attention(
        q, k, v, causal=True, block_q=128, block_k=128).sum()))(q)
    g2 = jax.jit(jax.grad(lambda q: _xla_oracle(
        q, k, v, None, True, 64**-0.5).sum()))(q)
    np.testing.assert_allclose(_fetch(g1), _fetch(g2), atol=3e-3)


def test_flash_pos_ring_primitives_compile():
    """The ring per-hop primitives (position-masked fwd + bwd) on-chip:
    one-device ring degenerates to plain flash — compare against it."""
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        flash_attention_pos, flash_bwd_pos)

    b, h, l, d = 1, 2, 512, 64
    q, k, v = (_rand((b, h, l, d), s) for s in (10, 11, 12))
    zero_off = jnp.zeros(2, jnp.int32)
    out, lse = jax.jit(lambda q, k, v: flash_attention_pos(
        q, k, v, zero_off, zero_off, causal=True, block_q=256,
        block_k=256))(q, k, v)
    want = _fetch(jax.jit(_xla_oracle, static_argnums=(4, 5))(
        q, k, v, None, True, d**-0.5))
    np.testing.assert_allclose(_fetch(out), want, atol=2e-4, rtol=1e-3)
    assert np.isfinite(_fetch(lse)).all()

    g = _rand((b, h, l, d), 13)
    delta = jnp.sum(g * out, axis=-1)
    dq, dk, dv = jax.jit(lambda *a: flash_bwd_pos(
        *a, zero_off, zero_off, causal=True, block_q=256, block_k=256))(
            q, k, v, g, lse, delta)
    want_dq = jax.jit(jax.grad(lambda q: (_xla_oracle(
        q, k, v, None, True, d**-0.5) * g).sum()))(q)
    np.testing.assert_allclose(_fetch(dq), _fetch(want_dq), atol=3e-3)


def test_fused_groupnorm_compiles_and_matches():
    from from_ddpm_to_stable_diffusion_tpu.ops.groupnorm import group_norm

    x = _rand((8, 16, 16, 128), 14, jnp.bfloat16)
    scale = _rand((128,), 15)
    bias = _rand((128,), 16)
    got = jax.jit(lambda x: group_norm(x, 32, scale, bias, act="silu",
                                       use_pallas=True))(x)
    want = jax.jit(lambda x: group_norm(x, 32, scale, bias, act="silu",
                                        use_pallas=False))(
        x.astype(jnp.float32))
    np.testing.assert_allclose(_fetch(got).astype(np.float32),
                               _fetch(want), atol=5e-2)


def test_tiny_unet_train_steps_on_chip():
    """A real grad program over the tiny UNet: flash bwd + fused-GN bwd
    compiled together; loss finite across steps."""
    from from_ddpm_to_stable_diffusion_tpu.io import (DataLoader,
                                                      SyntheticImageDataset)
    from from_ddpm_to_stable_diffusion_tpu.io.data import prefetch_to_device
    from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import (
        DDPMTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig

    cfg = TinySDConfig(epoch=1, batch_size=8, img_size=32, T=20, channel=64,
                       dropout=0.0, dtype="bf16", warmup_epochs=1)
    trainer = DDPMTrainer(cfg)
    loader = DataLoader(SyntheticImageDataset(16, 32), 8)
    state = trainer.create_state(len(loader))
    rng = jax.random.key(0)
    losses = []
    for images, labels in prefetch_to_device(loader, trainer.mesh):
        state, loss = trainer.train_step(state, images, labels, rng)
        losses.append(float(loss))
    assert losses and all(np.isfinite(losses)), losses


def test_mmdit_flow_train_step_on_chip():
    """The rectified-flow MMDiT train step (joint-attention fwd + flash
    bwd + adamw) lowers and produces finite loss on the real chip."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import MMDiTConfig
    from from_ddpm_to_stable_diffusion_tpu.pipelines.mmdit_trainer import (
        MMDiTTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.config import (
        FlowTrainConfig)

    mcfg = MMDiTConfig(patch_size=2, in_channels=4, depth=2,
                       adm_in_channels=16, context_dim=32,
                       pos_embed_max_size=8)
    cfg = FlowTrainConfig(epoch=1, batch_size=2, img_size=16,
                          context_len=8, dtype="bf16", warmup_epochs=1)
    trainer = MMDiTTrainer(mcfg, cfg)
    state = trainer.create_state(steps_per_epoch=2)
    r = np.random.default_rng(0)
    state, loss = trainer.train_step(
        state,
        r.normal(size=(2, 16, 16, 4)).astype(np.float32),
        r.normal(size=(2, 8, 32)).astype(np.float32),
        r.normal(size=(2, 16)).astype(np.float32),
        jax.random.key(0))
    assert np.isfinite(float(loss))


def test_int8_dot_on_chip():
    """The W8A8 path (ops/quantize.py) lowers to the int8 MXU on the real
    chip and stays accurate (serving path for --int8 SD3)."""
    from from_ddpm_to_stable_diffusion_tpu.ops.quantize import (
        int8_dot, quantize_per_channel)

    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (256, 512), jnp.bfloat16)
    w = jax.random.normal(kw, (512, 384), jnp.float32) / 16.0
    q, s = quantize_per_channel(w, axis=0)
    got = np.asarray(jax.jit(int8_dot)(x, q, s), np.float32)
    want = np.asarray(x, np.float32) @ np.asarray(w)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.03, rel


def test_joint_flash_attention_on_chip_exact():
    """Split-KV joint attention ≡ single concatenated flash call on the
    real chip (the SD3 154+4096 shape class, scaled down)."""
    from from_ddpm_to_stable_diffusion_tpu.ops.flash_attention import (
        flash_attention, joint_flash_attention)

    b, h, d, lc, lx = 1, 4, 64, 154, 1024
    r = np.random.default_rng(3)
    qc, kc, vc = (jnp.asarray(r.standard_normal((b, h, lc, d)),
                              jnp.bfloat16) for _ in range(3))
    qx, kx, vx = (jnp.asarray(r.standard_normal((b, h, lx, d)),
                              jnp.bfloat16) for _ in range(3))
    oc, ox = jax.jit(joint_flash_attention, static_argnums=(6, 7, 8, 9))(
        qc, kc, vc, qx, kx, vx, d ** -0.5, 1024, 1024, False)
    q = jnp.concatenate([qc, qx], 2)
    k = jnp.concatenate([kc, kx], 2)
    v = jnp.concatenate([vc, vx], 2)
    want = flash_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([oc, ox], 2), np.float32),
        np.asarray(want, np.float32), atol=2e-2)


def test_pp_flash_inside_shard_map_on_chip():
    """PP × Pallas (ROADMAP open question, settled round 4): Mosaic accepts
    pallas_call inside the PARTIAL-manual shard_map (axis_names={'stage'})
    of parallel/pipeline.py — the out_shapes' vma declarations
    (ops/flash_attention._vma_of) are what check_vma=True requires. A
    1-device 'stage' mesh compiles the same composition the pod path uses;
    forward AND the 1F1B training step, validated against the sequential
    stack."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        MMDiT, MMDiTConfig, make_joint_block_stage_fn,
        pipelined_joint_blocks, stack_joint_block_params)
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
    from from_ddpm_to_stable_diffusion_tpu.parallel.pipeline import (
        pipeline_value_and_grad)

    mesh = build_mesh({"stage": 1}, jax.devices()[:1])
    cfg = MMDiTConfig(depth=3, pos_embed_max_size=32)
    hs = cfg.hidden_size
    model = MMDiT(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((2, 64, 64, 16)), jnp.zeros((2,)),
        jnp.zeros((2, 2048)), jnp.zeros((2, 128, 4096)))["params"]
    ctx = _rand((2, 128, hs), 80) * 0.3
    x = _rand((2, 1024, hs), 81) * 0.3   # >= the 512 flash floor
    c = _rand((2, hs), 82) * 0.3

    with jax.default_matmul_precision("highest"):
        pctx, px = pipelined_joint_blocks(cfg, params, ctx, x, c, mesh,
                                          n_microbatches=2)
        lc = ctx.shape[1]
        z = jnp.concatenate([ctx, x, c[:, None]], axis=1)
        stage_fn = make_joint_block_stage_fn(cfg, lc, k=2)
        sp = stack_joint_block_params(params, n_blocks=2, n_stages=1)
        seq = stage_fn(jax.tree_util.tree_map(lambda p: p[0], sp), z)
        np.testing.assert_allclose(_fetch(pctx), _fetch(seq[:, :lc]),
                                   atol=2e-5)
        np.testing.assert_allclose(_fetch(px), _fetch(seq[:, lc:-1]),
                                   atol=2e-5)

        targets = _rand(z.shape, 83) * 0.1
        loss_fn = lambda y, t: jnp.mean((y - t) ** 2)
        ploss, pgrads = pipeline_value_and_grad(
            stage_fn, sp, z, targets, loss_fn, mesh, n_microbatches=2)

        def seq_loss(sp):
            out = [stage_fn(jax.tree_util.tree_map(lambda p: p[0], sp),
                            z[i:i + 1]) for i in range(2)]
            return jnp.mean(jnp.asarray(
                [loss_fn(o, targets[i:i + 1]) for i, o in enumerate(out)]))

        want_loss, want_grads = jax.jit(jax.value_and_grad(seq_loss))(sp)
        np.testing.assert_allclose(float(ploss), float(want_loss),
                                   atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(pgrads),
                        jax.tree_util.tree_leaves(want_grads)):
            np.testing.assert_allclose(_fetch(a), _fetch(b), atol=2e-5)
