"""Mixed-precision policy.

The reference uses fp16 autocast on GPU (02_stable_diffusion-3/utils.py:32,
sd3_infer.py:223). The TPU idiom is bf16 params/activations with fp32
accumulation on the MXU (``preferred_element_type``) and fp32 norm statistics;
this module centralizes that choice so every model takes one ``dtype`` knob.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype   # dtype parameters are stored in
    compute_dtype: jnp.dtype  # dtype activations/matmuls run in
    name: str = ""

    def cast_input(self, x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(self.compute_dtype)
        return x


POLICIES = {
    "fp32": DTypePolicy(jnp.float32, jnp.float32, "fp32"),
    "bf16": DTypePolicy(jnp.float32, jnp.bfloat16, "bf16"),
    "full_bf16": DTypePolicy(jnp.bfloat16, jnp.bfloat16, "full_bf16"),
}
