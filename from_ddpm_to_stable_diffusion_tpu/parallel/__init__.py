"""Mesh & sharding layer — the framework's communication backend.

The reference has zero parallelism (SURVEY.md §2.9): its only "communication"
is host↔device ``.cuda()/.cpu()`` swaps. The TPU-native equivalent is a
``jax.sharding.Mesh`` over ICI with XLA collectives inserted by the compiler
from NamedSharding annotations; multi-host extends the same mesh over DCN via
``jax.distributed.initialize``. This package is the single place axis names,
mesh construction, and per-model PartitionSpecs live.
"""

from .mesh import (DATA_AXIS, MODEL_AXIS, SEQ_AXIS, build_mesh, local_mesh,
                   replicate, shard_batch)
from .fsdp import (apply_fsdp, drop_data_axis, fsdp_shardings, fsdp_spec,
                   fsdp_tp_shardings)
