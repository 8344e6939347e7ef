"""ZeRO-style fully-sharded data parallelism (FSDP), the GSPMD way.

The reference's only acknowledgment of scale is the FSDP-unit comment at
``02_stable_diffusion-3/mmdit.py:375`` (torch FSDP would wrap each
JointBlock).  On TPU there is no wrapper class: FSDP is a *sharding
annotation*.  Store every parameter — and, because optimizer moments and
EMA mirrors have the same shapes, the whole train state — sharded over the
``data`` mesh axis and let XLA's SPMD partitioner insert the all-gather
before each use and the reduce-scatter on the gradients, riding ICI.
Per-device memory for params + moments drops ~Nx on an N-way data axis;
the collectives overlap with compute under XLA's latency-hiding scheduler.

Specs are chosen per leaf from its SHAPE alone (largest dimension divisible
by the axis size), so one rule covers params, AdamW moments, EMA copies and
optax.flatten's single concatenated vector alike.  Leaves smaller than
``min_size`` elements stay replicated — gather latency would outweigh the
memory saved.

Composition with tensor parallelism: :func:`fsdp_tp_shardings` starts from
the TP spec (:mod:`.sharding`) and shards the largest TP-free dimension
over ``data`` — the standard 2-D ("hybrid") layout of the scaling
playbook: weights live reduce-scattered over data, gathered just-in-time,
contracted sharded over model.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from .sharding import tp_spec_for_path, _path_str

# Below this many elements a leaf stays replicated: the all-gather of a
# tiny bias/scale costs more (latency, fused-op breakup) than its copy.
MIN_SHARD_SIZE = 2 ** 15


def fsdp_spec(shape, size: int, min_size: int = MIN_SHARD_SIZE,
              taken: P = None) -> P:
    """PartitionSpec sharding the largest free dim of ``shape`` over data.

    ``taken``: an existing spec (e.g. TP) whose axes must be preserved;
    the data axis goes on the largest dimension that spec leaves free.
    Returns the (possibly extended) spec; fully replicated leaves get P().
    """
    dims = tuple(shape)
    base = list(taken) if taken is not None else []
    base += [None] * (len(dims) - len(base))
    if int(np.prod(dims, dtype=np.int64)) < min_size:
        return P(*base) if any(a is not None for a in base) else P()
    # largest dim, ties to the first (leading) — row-major friendly
    order = sorted(range(len(dims)), key=lambda i: -dims[i])
    for i in order:
        if base[i] is None and dims[i] % size == 0:
            base[i] = DATA_AXIS
            return P(*base)
    return P(*base) if any(a is not None for a in base) else P()


def fsdp_shardings(tree, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """NamedShardings sharding every (large-enough) leaf over ``data``.

    Shape-only rule: apply to params, a whole TrainState (optimizer
    moments / EMA share param shapes; scalars like ``step`` stay
    replicated), or optax.flatten's 1-D state.
    """
    size = mesh.shape.get(DATA_AXIS, 1)

    def leaf(x):
        return NamedSharding(mesh, fsdp_spec(np.shape(x), size, min_size))

    return jax.tree_util.tree_map(leaf, tree)


def fsdp_tp_shardings(params, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Hybrid 2-D shardings: TP by param-path rule, FSDP on the free dim.

    For a column-parallel kernel (None, model) the data axis lands on dim
    0; for row-parallel (model, None) on dim 1; TP-replicated leaves get
    the plain FSDP rule. Indivisible dims fall back gracefully (the leaf
    keeps whatever axes do divide).
    """
    data = mesh.shape.get(DATA_AXIS, 1)
    model = mesh.shape.get("model", 1)

    def leaf(keypath, x):
        dims = np.shape(x)
        tp = tp_spec_for_path(_path_str(keypath))
        ok = len(tp) <= len(dims) and all(
            s is None or dims[i] % model == 0 for i, s in enumerate(tp))
        spec = fsdp_spec(dims, data, min_size, taken=tp if ok else None)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def apply_fsdp(tree, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Place a pytree on the mesh with FSDP shardings."""
    return jax.tree_util.tree_map(
        jax.device_put, tree, fsdp_shardings(tree, mesh, min_size))


def constrain(tree, shardings):
    """Pin a pytree to precomputed shardings inside a jitted program.

    End a train step with this so the updated state is *stored*
    reduce-scattered (ZeRO) rather than whatever layout XLA's propagation
    picked; donation then reuses the input buffers exactly.
    """
    return jax.tree_util.tree_map(
        jax.lax.with_sharding_constraint, tree, shardings)


def drop_data_axis(shardings):
    """Map (hybrid) FSDP NamedShardings to their gathered-over-data layout.

    Removes ``data`` from every spec and keeps all other axes — under
    hybrid FSDP×TP this is the just-in-time weight layout: gathered over
    data, still contracted sharded over model.  Constraining params to it
    at the top of a loss is the hybrid generalization of :func:`gather`
    (to which it degenerates when no other axis is present).
    """
    def leaf(s):
        spec = tuple(None if a == DATA_AXIS else a for a in (s.spec or ()))
        return NamedSharding(s.mesh, P(*spec))

    return jax.tree_util.tree_map(leaf, shardings)


def gather(tree, mesh: Mesh):
    """All-gather a ZeRO-sharded pytree to replicated, inside jit.

    Use at the TOP of the loss function — one explicit gather point per
    step.  Compute then runs on full weights (no per-op weight-sharding
    decisions for the SPMD partitioner to fight over), while the state
    stays *stored* sharded.  The constraint's transpose reduce-scatters
    the gradients back to the params' layout for free under autodiff.
    """
    full = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, full), tree)
