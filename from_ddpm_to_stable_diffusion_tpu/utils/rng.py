"""Deterministic PRNG key threading.

The reference relies on global torch RNG state and per-call generators
(01_.../pipeline.py:101-105, 02_.../sd3_infer.py:274-277, 06_.../utils.py:113).
The TPU-native contract is: one seed -> one ``jax.random`` key, split
hierarchically; every consumer gets an explicit key. Determinism is per-seed
at the pipeline level (bitwise across runs on the same topology), and
distribution-level vs the torch reference.
"""

from __future__ import annotations

import jax


class RngStream:
    """A named, counted fountain of PRNG keys from a single seed."""

    def __init__(self, seed: int | jax.Array = 0):
        if isinstance(seed, int):
            self._key = jax.random.key(seed)
        else:
            self._key = seed
        self._count = 0

    def next(self) -> jax.Array:
        key = jax.random.fold_in(self._key, self._count)
        self._count += 1
        return key

    def split(self, n: int):
        return [self.next() for _ in range(n)]
