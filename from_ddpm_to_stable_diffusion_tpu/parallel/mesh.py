"""Device mesh construction and basic sharding helpers.

Axis convention (scaling-book style):
- ``data``  — batch / DP axis; gradients psum over it (XLA inserts the
  collective from the sharding annotations, riding ICI).
- ``model`` — TP axis: attention heads / MLP hidden of MMDiT & SD1 UNet.
- ``seq``   — SP/CP axis for ring/Ulysses attention over long joint sequences.

One chip ⇒ a trivial 1-device mesh: every jitted function is written against
the mesh API so the same code scales 1 → N chips unchanged.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Join a multi-host mesh over DCN via ``jax.distributed.initialize``.

    On single-host (or TPU-pod auto-detection) all arguments stay None.
    Returns the global device count. After this, :func:`build_mesh` over
    ``jax.devices()`` spans all hosts — same API, more chips.
    """
    import jax.distributed

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return len(jax.devices())


def build_mesh(shape: Optional[Mapping[str, int]] = None,
               devices=None) -> Mesh:
    """Build a named mesh.

    ``shape`` maps axis name -> size, e.g. {"data": 4, "model": 2}. ``None``
    puts every available device on the data axis. Sizes must multiply to the
    device count (use -1 for one inferred axis).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if not shape:
        shape = {DATA_AXIS: n}
    names = list(shape.keys())
    sizes = list(shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh shape {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def local_mesh(n: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n local devices (default: all)."""
    devs = jax.devices()
    if n is not None:
        devs = devs[:n]
    return build_mesh({axis: len(devs)}, devs)


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Put host arrays on device, batch dim sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1))) if np.ndim(x) else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
