"""PP × Pallas on the chip: does Mosaic accept pallas_call inside the
partial-manual shard_map (axis_names={'stage'}) of parallel/pipeline.py?

CPU tests take the XLA attention fallback, so this lowering question was
open (ROADMAP). A 1-device 'stage' mesh compiles the SAME partial-manual
shard_map + pallas_call composition the multi-stage pod path uses — the
sequence is sized so joint attention takes the flash kernel (x stream
1024 tokens ≥ the 512 eligibility floor).

Checks BOTH directions: pipelined forward (pipeline_apply) and the 1F1B
training step (pipeline_value_and_grad → dq/dkv kernels inside the
shard_map), each validated numerically against the sequential stack.

Run: python tools/probe_pp_flash.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# exactness check: disable this backend's default fp32->bf16 matmul
# downcast so pipelined-vs-sequential differences mean something
jax.config.update("jax_default_matmul_precision", "highest")

from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (  # noqa: E402
    MMDiT, MMDiTConfig, make_joint_block_stage_fn, pipelined_joint_blocks,
    stack_joint_block_params)
from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh  # noqa: E402
from from_ddpm_to_stable_diffusion_tpu.parallel.pipeline import (  # noqa: E402
    pipeline_value_and_grad)


def main():
    print(f"[pp-flash] backend: {jax.default_backend()} "
          f"{jax.devices()}", flush=True)
    mesh = build_mesh({"stage": 1}, jax.devices()[:1])
    cfg = MMDiTConfig(depth=3, pos_embed_max_size=32)
    hs = cfg.hidden_size
    model = MMDiT(cfg)
    xs = jnp.zeros((2, 64, 64, 16))
    params = jax.jit(model.init)(
        jax.random.key(0), xs, jnp.zeros((2,)), jnp.zeros((2, 2048)),
        jnp.zeros((2, 128, 4096)))["params"]

    kc, kx, km = jax.random.split(jax.random.key(1), 3)
    ctx = jax.random.normal(kc, (2, 128, hs), jnp.float32) * 0.3
    x = jax.random.normal(kx, (2, 1024, hs), jnp.float32) * 0.3
    c = jax.random.normal(km, (2, hs), jnp.float32) * 0.3

    # ---- forward: pipelined vs sequential
    pctx, px = pipelined_joint_blocks(cfg, params, ctx, x, c, mesh,
                                      n_microbatches=2)
    pctx, px = jax.block_until_ready((pctx, px))
    print("[pp-flash] pipelined forward COMPILED+RAN (flash inside "
          "partial-manual shard_map)", flush=True)

    lc = ctx.shape[1]
    z = jnp.concatenate([ctx, x, c[:, None]], axis=1)
    stage_fn = make_joint_block_stage_fn(cfg, lc, k=2)
    sp = stack_joint_block_params(params, n_blocks=2, n_stages=1)
    seq = stage_fn(jax.tree_util.tree_map(lambda p: p[0], sp), z)
    dc = float(jnp.max(jnp.abs(pctx - seq[:, :lc])))
    dx = float(jnp.max(jnp.abs(px - seq[:, lc:-1])))
    print(f"[pp-flash] fwd exactness vs sequential: dctx {dc:.2e} "
          f"dx {dx:.2e}", flush=True)
    assert dc < 2e-4 and dx < 2e-4

    # ---- backward: 1F1B value_and_grad with the flash dq/dkv kernels
    targets = jax.random.normal(jax.random.key(2), z.shape) * 0.1
    loss_fn = lambda y, t: jnp.mean((y - t) ** 2)
    ploss, pgrads = pipeline_value_and_grad(
        stage_fn, sp, z, targets, loss_fn, mesh, n_microbatches=2)
    ploss = float(ploss)
    print(f"[pp-flash] 1F1B value_and_grad COMPILED+RAN, loss {ploss:.6f}",
          flush=True)

    def seq_loss(sp):
        mb = z.shape[0] // 2
        out = [stage_fn(jax.tree_util.tree_map(lambda p: p[0], sp),
                        z[i * mb:(i + 1) * mb]) for i in range(2)]
        return jnp.mean(jnp.asarray(
            [loss_fn(o, targets[i * mb:(i + 1) * mb])
             for i, o in enumerate(out)]))

    want_loss, want_grads = jax.jit(jax.value_and_grad(seq_loss))(sp)
    gerr = max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(jax.tree_util.tree_leaves(pgrads),
                               jax.tree_util.tree_leaves(want_grads)))
    print(f"[pp-flash] bwd exactness: dloss "
          f"{abs(ploss - float(want_loss)):.2e} max dgrad {gerr:.2e}",
          flush=True)
    assert abs(ploss - float(want_loss)) < 1e-5 and gerr < 2e-4
    print("[pp-flash] OK — Mosaic accepts pallas_call inside the "
          "partial-manual shard_map, fwd AND 1F1B bwd, exact.", flush=True)


if __name__ == "__main__":
    main()
