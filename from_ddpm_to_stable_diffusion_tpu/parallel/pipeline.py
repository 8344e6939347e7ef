"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference has no PP (SURVEY.md §2.9; depth-28 MMDiT fits one chip), so
this is the forward-looking scaling hook: a homogeneous block stack (e.g.
MMDiT joint blocks, T5 blocks) is partitioned over a ``stage`` mesh axis;
microbatches stream through the stages with ``ppermute`` hand-offs between
ICI neighbors. The schedule is the classic (n_micro + n_stages − 1)-tick
pipeline: tick t runs stage s on microbatch (t − s), bubbles at the ends.

Exact: output equals running the full stack sequentially (tested on the
fake 8-device mesh). Expert parallelism (EP) has no counterpart in the
reference's models (no MoE); when an MoE layer lands, its expert axis
composes with this module's mesh the same way (shard experts over an
``expert`` axis + all_to_all token routing) — see ``EP_SPEC`` below.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

STAGE_AXIS = "stage"

EP_SPEC = {
    "axis": "expert",
    "routing": "jax.lax.all_to_all token dispatch/combine over ICI",
    "weights": "per-expert leading dim sharded over the expert axis",
    "status": "spec-only: the reference capability set contains no MoE",
}


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = STAGE_AXIS,
) -> jax.Array:
    """Run ``x`` through ``n_stages`` stacked stages, pipelined over ``axis``.

    stage_fn(params_slice, x_micro) -> y_micro, applied once per stage;
    stage_params: pytree whose leaves have leading dim n_stages (stacked
    per-stage weights); x: (batch, ...) with batch % n_microbatches == 0.
    """
    n_stages = mesh.shape[axis]
    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    mb = b // n_microbatches
    micro = x.reshape(n_microbatches, mb, *x.shape[1:])

    stage_spec = jax.tree_util.tree_map(
        lambda _: P(axis), stage_params)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(stage_spec, P()),
        out_specs=P())
    def run(params_local, micro_all):
        # params_local leaves: (1, ...) — this stage's slice
        params_here = jax.tree_util.tree_map(lambda p: p[0], params_local)
        sid = jax.lax.axis_index(axis)
        n_ticks = n_microbatches + n_stages - 1
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            buf, outputs = carry
            # stage 0 ingests microbatch t (if in range); others take buf
            feed = jnp.where(t < n_microbatches,
                             micro_all[jnp.minimum(t, n_microbatches - 1)],
                             jnp.zeros_like(buf))
            x_in = jnp.where(sid == 0, feed, buf)
            y = stage_fn(params_here, x_in)
            # the microbatch index this stage just produced: t - sid
            midx = t - sid
            is_last = sid == n_stages - 1
            valid = jnp.logical_and(midx >= 0, midx < n_microbatches)

            def write(outs):
                idx = jnp.clip(midx, 0, n_microbatches - 1)
                return outs.at[idx].set(
                    jnp.where(jnp.logical_and(is_last, valid), y, outs[idx]))

            outputs = write(outputs)
            # hand off to the next stage
            buf_next = jax.lax.ppermute(y, axis, perm)
            return (buf_next, outputs), None

        # the carry varies per-stage inside shard_map: mark it 'varying'
        buf0 = jax.lax.pcast(jnp.zeros_like(micro_all[0]), (axis,),
                             to="varying")
        outs0 = jax.lax.pcast(jnp.zeros_like(micro_all), (axis,),
                              to="varying")
        (_, outputs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(n_ticks))
        # only the last stage holds real outputs; broadcast them
        outputs = jax.lax.psum(
            jnp.where(sid == n_stages - 1, outputs,
                      jnp.zeros_like(outputs)), axis)
        return outputs

    out = run(stage_params, micro)
    return out.reshape(b, *x.shape[1:])
