"""Expert parallelism: Switch-style top-1 MoE FFN sharded over a mesh axis.

The reference capability set contains no MoE (SURVEY.md §2.9 prescribes a
spec-only EP hook); this module upgrades the hook to a working component so
the parallelism layer is complete: a router + E gated-MLP experts where the
expert dimension shards over an ``expert`` mesh axis and tokens reach their
expert's owner via ONE ``jax.lax.all_to_all`` each way — the TPU-native
analogue of Switch-Transformer dispatch (top-1 routing, capacity factor,
renormalized gate applied on combine).

TPU-first choices:
- dispatch/combine are ONE-HOT MATMULS (MXU work, static shapes), never
  gather/scatter with dynamic shapes — XLA cannot tile data-dependent
  shapes onto the systolic array;
- capacity is a static bound (tokens beyond it drop to the residual path,
  exactly like Switch); position-in-expert comes from a cumsum, not a loop;
- under ``shard_map`` each device owns E/n experts and the all_to_all
  rides ICI; without a mesh the same math runs as plain batched einsums,
  and the two paths are exactness-tested against each other.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

EXPERT_AXIS = "expert"


class SwitchFFN(nn.Module):
    """Top-1 routed mixture-of-experts gated MLP over (B, L, C) tokens.

    Returns (out, aux_loss): ``out`` combines each token's expert output
    scaled by its (softmax) router probability — tokens over capacity pass
    through as zeros (callers add the residual); ``aux_loss`` is the Switch
    load-balancing loss (mean fraction·prob product × E).

    Sharding contract: routing and the dispatch einsum run OUTSIDE
    shard_map, so ``x`` (and the dispatch tensor) must be replicated over
    the ``expert`` axis — only the expert dim of the inbox tensor shards.
    Combining with data parallelism on the SAME devices (x sharded on
    batch over a mixed data×expert mesh) is supported because the batch
    dims of x are unconstrained here: GSPMD shards the routing math on
    ``data`` and reshards the (E, K, C) inboxes over ``expert``
    (exercised by tests/test_expert.py::test_switch_ffn_data_expert_mesh).
    """

    num_experts: int
    hidden_mult: int = 4
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mesh: Optional[Mesh] = None,
                 axis: str = EXPERT_AXIS):
        b, l, c = x.shape
        e = self.num_experts
        h = self.hidden_mult * c
        # router in fp32 — tiny, and top-1 decisions should not flip with
        # bf16 rounding
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)          # (B, L, E)
        gate = jnp.max(probs, axis=-1)                   # (B, L)
        choice = jnp.argmax(probs, axis=-1)              # (B, L)

        tokens = b * l
        capacity = int(self.capacity_factor * tokens / e + 1)
        onehot = jax.nn.one_hot(choice.reshape(tokens), e,
                                dtype=jnp.float32)       # (T, E)
        # position of each token within its expert's queue: -1 everywhere
        # except the chosen column, where it counts 0,1,2,... per expert
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0  # (T, E)
        keep = (pos < capacity) & (onehot > 0)           # (T, E)
        slot_idx = jnp.max(jnp.where(keep, pos, -1.0), axis=-1)  # (T,)
        slot = jax.nn.one_hot(slot_idx.astype(jnp.int32), capacity,
                              dtype=jnp.float32)         # (T, K); 0s if dropped
        slot = slot * (slot_idx >= 0)[:, None]
        # dispatch tensor (T, E, K): routes token t to (expert, slot)
        dispatch = keep.astype(jnp.float32)[:, :, None] * slot[:, None, :]

        xe = jnp.einsum("td,tek->ekd",
                        x.reshape(tokens, c).astype(jnp.float32), dispatch)
        # xe: (E, K, C) — expert inboxes, static shapes

        wi = self.param("wi", nn.initializers.lecun_normal(), (e, c, h))
        wg = self.param("wg", nn.initializers.lecun_normal(), (e, c, h))
        wo = self.param("wo", nn.initializers.lecun_normal(), (e, h, c))

        def expert_ffn(xe_local, wi_l, wg_l, wo_l):
            up = jnp.einsum("ekc,ech->ekh", xe_local, wi_l)
            gatev = jnp.einsum("ekc,ech->ekh", xe_local, wg_l)
            act = jax.nn.silu(gatev) * up
            return jnp.einsum("ekh,ehc->ekc", act, wo_l)

        if mesh is not None and mesh.shape.get(axis, 1) > 1:
            n = mesh.shape[axis]
            assert e % n == 0, f"experts {e} must divide axis size {n}"
            espec = P(axis)

            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(espec, espec, espec, espec), out_specs=espec)
            def run(xe_l, wi_l, wg_l, wo_l):
                # xe arrives sharded on the EXPERT dim — that IS the
                # dispatch all_to_all when the producing einsum's output
                # resharding happens (GSPMD inserts it); the FFN then runs
                # on the local E/n experts.
                return expert_ffn(xe_l, wi_l, wg_l, wo_l)

            ye = run(xe, wi.astype(jnp.float32), wg.astype(jnp.float32),
                     wo.astype(jnp.float32))
        else:
            ye = expert_ffn(xe, wi.astype(jnp.float32),
                            wg.astype(jnp.float32), wo.astype(jnp.float32))

        # combine: undo dispatch (zeros for dropped tokens), weight by the
        # router probability of the chosen expert
        out = jnp.einsum("ekd,tek->td", ye, dispatch)
        out = out * gate.reshape(tokens, 1)
        out = out.reshape(b, l, c).astype(self.dtype)

        # Switch aux loss: E * mean_e(fraction_routed_e * mean_prob_e)
        frac = jnp.mean(onehot, axis=0)
        mean_prob = jnp.mean(probs.reshape(tokens, e), axis=0)
        aux = e * jnp.sum(frac * mean_prob)
        return out, aux
