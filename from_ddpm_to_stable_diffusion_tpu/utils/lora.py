"""LoRA: low-rank adapter fine-tuning over any param tree.

The reference has no fine-tuning story (training is always full-rank from
scratch); a framework serving SD1/SD3-class checkpoints needs one — LoRA
is the standard: freeze the base weights W and train a low-rank delta
ΔW = (α/r)·A·B, merging W+ΔW at use.

TPU-native design decisions:
- The adapter set is a FLAT DICT keyed by the param path string — a plain
  pytree, so it drops straight into optax/Orbax/shardings; the base tree
  is never restructured.
- :func:`merge_lora` runs INSIDE the jitted loss: XLA fuses the rank-r
  matmul + add into the surrounding program, and its transpose routes
  gradients to (A, B) only — the base stays frozen with zero bookkeeping
  (no stop_gradients, no param partitioning: base enters as a non-diff
  argument).
- B is zero-initialized, so at init merged(W) == W exactly — fine-tuning
  starts from the checkpoint's behavior (tested).
- Rank-generic: a kernel of shape s gets A: s[:-1]+(r,), B: (r, s[-1]),
  ΔW = tensordot(A, B) — 2-D attention/MLP kernels and 4-D conv kernels
  alike.

Trainer integration: ``DDPMTrainer(..., lora_rank=r, base_params=W)``
trains only the adapters (pipelines/ddpm_trainer.py); the same two
functions bolt onto any other trainer's loss.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Pattern

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.sharding import _path_str

# Default targets: attention + MLP projection kernels (the standard LoRA
# placement) — same families the TP rules shard (parallel/sharding.py).
DEFAULT_TARGETS = re.compile(
    r"(qkv|/q|/k|/v|out|proj|fc1|fc2|geglu_in|geglu_out|mlp_fc1|mlp_fc2"
    r"|wi_0|wi_1|wo)[^/]*/kernel$")


def init_lora(rng, params, rank: int = 8,
              targets: Optional[Pattern] = None,
              min_dim: int = 1) -> Dict[str, dict]:
    """Zero-effect adapters for every kernel whose path matches ``targets``.

    Returns {path: {"a": s[:-1]+(r,) normal(1/√fan_in), "b": (r, s[-1])
    zeros}} — a flat dict pytree. ``min_dim``: skip kernels whose last dim
    is smaller (adapting a 3-wide output head is noise).
    """
    targets = targets or DEFAULT_TARGETS
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora = {}
    for keypath, leaf in flat:
        path = _path_str(keypath)
        if np.ndim(leaf) < 2 or np.shape(leaf)[-1] < min_dim:
            continue
        if not targets.search(path):
            continue
        rng, k = jax.random.split(rng)
        s = np.shape(leaf)
        fan_in = int(np.prod(s[:-1]))
        lora[path] = {
            "a": (jax.random.normal(k, s[:-1] + (rank,), jnp.float32)
                  / np.sqrt(fan_in)),
            "b": jnp.zeros((rank, s[-1]), jnp.float32),
        }
    if not lora:
        raise ValueError("no parameter matched the LoRA target pattern")
    return lora


def merge_lora(params, lora: Dict[str, dict], scale: float = 1.0):
    """base + (scale/r)·A·B per adapted leaf, inside or outside jit.

    The contraction is over A's trailing rank axis, so any kernel rank
    works (conv kernels included). Leaves without an adapter pass through
    untouched.
    """
    def leaf(keypath, w):
        e = lora.get(_path_str(keypath))
        if e is None:
            return w
        r = e["b"].shape[0]
        delta = jnp.tensordot(e["a"], e["b"], axes=([-1], [0]))
        return w + (scale / r) * delta.astype(w.dtype)

    return jax.tree_util.tree_map_with_path(leaf, params)


def num_lora_params(lora: Dict[str, dict]) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(lora))
