"""Tensor-parallel PartitionSpecs for the model zoo.

Megatron-style TP expressed the GSPMD way: annotate weight shardings with
NamedSharding over the ``model`` mesh axis and let XLA insert the
collectives (the all-reduce after attention-out / MLP-down falls out of the
sharding propagation automatically, riding ICI).

Column-parallel (shard the OUTPUT feature dim):
  attention qkv/q/k/v kernels, MLP up/gate projections (fc1, geglu_in,
  mlp_fc1, wi_0, wi_1), adaLN modulation producers.
Row-parallel (shard the INPUT feature dim):
  attention out/proj kernels, MLP down projections (fc2, geglu_out,
  mlp_fc2, wo).
Everything else (convs, norms, embeddings, biases of row-parallel layers)
is replicated — convs dominate FLOPs only in the VAE, which fits one chip.
"""

from __future__ import annotations

import re
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path regex, spec builder) — first match wins. Paths are '/'-joined flax
# param paths ending in the leaf name (kernel/bias/scale/embedding/...).
_COL_FAMS = r"(qkv|/q|/k|/v|fc1|geglu_in|mlp_fc1|wi_0|wi_1|adaLN|time_fc1)"
_ROW_FAMS = r"(out|proj|fc2|geglu_out|mlp_fc2|/o|wo|time_fc2)"
_COLUMN = re.compile(_COL_FAMS + r"[^/]*/kernel$")
_ROW = re.compile(_ROW_FAMS + r"[^/]*/kernel$")
_COLUMN_BIAS = re.compile(
    r"(qkv|/q|/k|/v|fc1|geglu_in|mlp_fc1|adaLN|time_fc1)[^/]*/bias$")
# W8A8 layout (ops/quantize.py): kernel → {q int8 (K,N), scale fp32 (N,)}.
# Same orientation as the kernel; a column layer's per-output scale shards
# with the output dim, a row layer's stays replicated. Row-parallel
# int8_dot is exact under GSPMD: the per-token abs-max over the sharded K
# axis and the int32 partial sums both all-reduce automatically.
_COLUMN_Q = re.compile(_COL_FAMS + r"[^/]*/q$")
_ROW_Q = re.compile(_ROW_FAMS + r"[^/]*/q$")
_COLUMN_SCALE = re.compile(_COL_FAMS + r"[^/]*/scale$")


def tp_spec_for_path(path: str) -> P:
    """PartitionSpec for one flax param path under model-axis TP."""
    if _ROW.search(path) or _ROW_Q.search(path):
        return P(MODEL_AXIS, None)
    if _COLUMN.search(path) or _COLUMN_Q.search(path):
        return P(None, MODEL_AXIS)
    if _COLUMN_BIAS.search(path) or _COLUMN_SCALE.search(path):
        return P(MODEL_AXIS)
    return P()  # replicated


def _path_str(keypath) -> str:
    parts = []
    for k in keypath:
        name = getattr(k, "key", None) or getattr(k, "idx", None) or str(k)
        parts.append(str(name))
    return "/".join(parts)


def tp_shardings(params, mesh: Mesh):
    """A pytree of NamedShardings matching ``params`` under model-axis TP.

    Specs are validated against leaf ranks/divisibility; anything that does
    not divide evenly falls back to replication (correct, just not sharded).
    """
    size = mesh.shape.get(MODEL_AXIS, 1)

    def leaf_sharding(keypath, leaf):
        path = _path_str(keypath)
        spec = tp_spec_for_path(path)
        dims = np.shape(leaf)
        ok = len(spec) <= len(dims) and all(
            s is None or dims[i] % size == 0 for i, s in enumerate(spec))
        return NamedSharding(mesh, spec if ok else P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def apply_tp(params, mesh: Mesh):
    """Place a param tree on the mesh with TP shardings."""
    shardings = tp_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
