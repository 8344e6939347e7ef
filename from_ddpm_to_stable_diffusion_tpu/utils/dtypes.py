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


def cast_params_for_inference(params, dtype=jnp.bfloat16, min_ndim: int = 2):
    """Store big floating parameters in the compute dtype for serving.

    fp32 params that a bf16 forward casts per call cost double the HBM
    weight reads AND a relayout copy of every conv/matmul kernel per step
    (measured: ~600 MB/step of f32 weight copies in the SD1 UNet — see
    docs/sd1_step_profile.md). The per-call cast rounds to the same bf16
    values, so pre-casting is numerically identical for inference. 1-D
    params (biases, norm scales — trivial bytes, used in fp32 statistics)
    stay fp32.
    """
    import jax

    def cast(p):
        if (hasattr(p, "ndim") and p.ndim >= min_ndim
                and jnp.issubdtype(p.dtype, jnp.floating)):
            return p.astype(dtype)
        return p

    return jax.tree_util.tree_map(cast, params)
