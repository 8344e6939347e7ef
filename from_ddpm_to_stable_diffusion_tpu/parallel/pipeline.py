"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference has no PP (SURVEY.md §2.9; depth-28 MMDiT fits one chip), so
this is the forward-looking scaling hook: a homogeneous block stack (e.g.
MMDiT joint blocks, T5 blocks) is partitioned over a ``stage`` mesh axis;
microbatches stream through the stages with ``ppermute`` hand-offs between
ICI neighbors. The schedule is the classic (n_micro + n_stages − 1)-tick
pipeline: tick t runs stage s on microbatch (t − s), bubbles at the ends.

Exact: output equals running the full stack sequentially (tested on the
fake 8-device mesh). Expert parallelism (EP) has no counterpart in the
reference's models (no MoE); ``parallel.expert.SwitchFFN`` provides the
EP implementation (experts sharded over an ``expert`` axis), and its mesh
axis composes with this module's ``stage`` axis.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

STAGE_AXIS = "stage"

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

    # manual only over the stage axis: any further mesh axes (e.g. a TP
    # 'model' axis) stay under GSPMD, so TP-sharded stage weights keep
    # their head/MLP sharding inside each stage
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(stage_spec, P()),
        out_specs=P(), axis_names={axis})
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


# --------------------------------------------------------------------------
# 1F1B training schedule
# --------------------------------------------------------------------------
def make_1f1b_schedule(n_stages: int, n_micro: int):
    """Simulate the synchronous 1F1B (PipeDream-flush) schedule host-side.

    Returns int32 arrays ``F``, ``Bw`` of shape (n_ticks, n_stages): the
    microbatch index stage s forwards/backwards at tick t (−1 = idle).
    Policy: stage s keeps at most min(n_stages − s, n_micro) microbatches
    in flight; once at the cap (or out of forwards) it runs a backward —
    so the steady state alternates 1 forward / 1 backward and the live
    activation stash per stage is bounded by n_stages, not n_micro.
    """
    S, M = n_stages, n_micro
    limit = [min(S - s, M) for s in range(S)]
    f_done_tick = [[-1] * M for _ in range(S)]   # tick fwd(s,m) ran
    b_done_tick = [[-1] * M for _ in range(S)]
    f_cnt = [0] * S
    b_cnt = [0] * S
    F, Bw = [], []
    t = 0
    while b_cnt[0] < M:
        assert t < 4 * (M + S), "1F1B schedule failed to converge"
        frow, brow = [-1] * S, [-1] * S
        for s in range(S):
            m_f, m_b = f_cnt[s], b_cnt[s]
            f_ready = m_f < M and (s == 0 or 0 <= f_done_tick[s - 1][m_f] < t)
            b_ready = m_b < m_f and (
                s == S - 1 or 0 <= b_done_tick[s + 1][m_b] < t)
            in_flight = m_f - m_b
            if b_ready and (in_flight >= limit[s] or m_f == M):
                brow[s] = m_b
                b_done_tick[s][m_b] = t
                b_cnt[s] += 1
            elif f_ready and in_flight < limit[s]:
                # at the cap the stage IDLES until a gradient arrives —
                # eager forwards would grow the stash past the 1F1B bound
                frow[s] = m_f
                f_done_tick[s][m_f] = t
                f_cnt[s] += 1
        F.append(frow)
        Bw.append(brow)
        t += 1
    return np.asarray(F, np.int32), np.asarray(Bw, np.int32)


def pipeline_value_and_grad(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    targets: jax.Array,
    loss_fn: Callable,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = STAGE_AXIS,
):
    """One pipelined training step: (mean loss, grads of stage_params).

    1F1B schedule over the ``axis`` mesh dimension: activations stream
    forward and gradients stream backward through ``ppermute`` ICI
    hand-offs; each stage stashes at most ``n_stages`` microbatch inputs
    (recomputation-free vjp per stage). Exact: loss and grads equal the
    sequential stacked-stage computation (tested on the fake 8-dev mesh).

    stage_fn(params_slice, x_micro) -> y_micro;
    loss_fn(y_micro, target_micro) -> scalar (summed/averaged over the
    microbatch — the pipeline averages over microbatches);
    stage_params: leaves with leading dim n_stages; x, targets: (batch, …).
    """
    n_stages = mesh.shape[axis]
    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    mb = b // n_microbatches
    micro = x.reshape(n_microbatches, mb, *x.shape[1:])
    tgt = targets.reshape(n_microbatches, mb, *targets.shape[1:])
    F, Bw = make_1f1b_schedule(n_stages, n_microbatches)
    n_ticks = F.shape[0]
    S, M = n_stages, n_microbatches

    stage_spec = jax.tree_util.tree_map(lambda _: P(axis), stage_params)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(stage_spec, P(), P()),
        out_specs=(P(), stage_spec), axis_names={axis})
    def run(params_local, micro_all, tgt_all):
        params_here = jax.tree_util.tree_map(lambda p: p[0], params_local)
        sid = jax.lax.axis_index(axis)
        up = [(i, i + 1) for i in range(S - 1)]
        down = [(i + 1, i) for i in range(S - 1)]
        F_arr = jnp.asarray(F)     # (n_ticks, S) schedule constants
        B_arr = jnp.asarray(Bw)
        zero_micro = jnp.zeros_like(micro_all[0])

        def varying(v):
            return jax.lax.pcast(v, (axis,), to="varying")

        def tick(carry, t):
            in_buf, x_stash, g_buf, dparams, loss_acc = carry
            fm = F_arr[t, sid]          # micro to forward here (−1 idle)
            bm = B_arr[t, sid]          # micro to backward here (−1 idle)
            f_slot = jnp.clip(fm, 0) % S
            b_slot = jnp.clip(bm, 0) % S

            # ---- forward (masked; one fwd per tick keeps slots disjoint)
            feed = micro_all[jnp.clip(fm, 0, M - 1)]
            x_in = jnp.where(sid == 0, feed, in_buf[f_slot])
            y = stage_fn(params_here, x_in)
            x_stash = x_stash.at[f_slot].set(
                jnp.where(fm >= 0, x_in, x_stash[f_slot]))
            # last stage: loss + dL/dy enter the grad stream at fwd time
            t_m = tgt_all[jnp.clip(fm, 0, M - 1)]
            loss_m, gy = jax.value_and_grad(
                lambda yy: loss_fn(yy, t_m))(y)
            is_last = sid == S - 1
            take_loss = jnp.logical_and(is_last, fm >= 0)
            loss_acc = loss_acc + jnp.where(take_loss, loss_m / M, 0.0)
            g_buf = g_buf.at[f_slot].set(
                jnp.where(take_loss, gy / M, g_buf[f_slot]))

            # ---- backward (masked): vjp at the stashed input
            g_in = g_buf[b_slot]
            _, vjp_fn = jax.vjp(stage_fn, params_here, x_stash[b_slot])
            dp, dx = vjp_fn(g_in)
            dparams = jax.tree_util.tree_map(
                lambda acc, d: acc + jnp.where(bm >= 0, d, 0.0),
                dparams, dp)

            # ---- hand-offs: y → next stage's in_buf, dx → prev's g_buf
            y_recv = jax.lax.ppermute(y, axis, up)
            dx_recv = jax.lax.ppermute(dx, axis, down)
            prev = jnp.clip(sid - 1, 0, S - 1)
            nxt = jnp.clip(sid + 1, 0, S - 1)
            fm_prev = F_arr[t, prev]    # what the sender forwarded
            bm_next = B_arr[t, nxt]
            take_y = jnp.logical_and(sid > 0, fm_prev >= 0)
            in_buf = in_buf.at[jnp.clip(fm_prev, 0) % S].set(
                jnp.where(take_y, y_recv,
                          in_buf[jnp.clip(fm_prev, 0) % S]))
            take_g = jnp.logical_and(sid < S - 1, bm_next >= 0)
            g_buf = g_buf.at[jnp.clip(bm_next, 0) % S].set(
                jnp.where(take_g, dx_recv,
                          g_buf[jnp.clip(bm_next, 0) % S]))
            return (in_buf, x_stash, g_buf, dparams, loss_acc), None

        stash0 = varying(jnp.zeros((S,) + zero_micro.shape,
                                   zero_micro.dtype))
        # params_here is already stage-varying; its zeros inherit that
        dparams0 = jax.tree_util.tree_map(jnp.zeros_like, params_here)
        carry0 = (stash0, stash0, stash0, dparams0,
                  varying(jnp.zeros((), jnp.float32)))
        (_, _, _, dparams, loss_acc), _ = jax.lax.scan(
            tick, carry0, jnp.arange(n_ticks))
        loss = jax.lax.psum(loss_acc, axis)  # only last stage contributes
        grads = jax.tree_util.tree_map(lambda d: d[None], dparams)
        return loss, grads

    return run(stage_params, micro, tgt)
