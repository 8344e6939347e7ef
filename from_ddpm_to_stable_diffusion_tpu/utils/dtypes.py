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


import re

_NORM_PATH = re.compile(r"(^|_)(norm|ln)($|_|\d)|groupnorm|layernorm|rms",
                        re.IGNORECASE)


def cast_params_for_inference(params, dtype=jnp.bfloat16, min_ndim: int = 2):
    """Store floating parameters in the compute dtype for serving.

    fp32 params that a bf16 forward casts per call cost double the HBM
    weight reads AND a relayout copy of every conv/matmul kernel per step
    (measured: ~600 MB/step of f32 weight copies in the SD1 UNet — see
    docs/SD1_STEP_PROFILE.md). The per-call cast rounds to the same bf16
    values, so pre-casting is numerically identical for inference.

    1-D biases under conv/dense modules are ALSO cast: flax promotes them
    to the compute dtype inside every call, and fp32 storage additionally
    costs a per-step copy+convert chain (~0.25 ms/step of f32[1280]-style
    DMA pairs in the SD1 UNet, measured). Norm-layer params (path matches
    norm/ln) stay fp32 — they feed fp32 statistics directly, so casting
    THEM would change numerics (tests/test_dtypes.py walks every real
    model tree asserting the convention holds).

    DONATES ``params``: the input tree is consumed (XLA frees each fp32
    buffer as its low-precision copy is written — halves peak HBM during
    the cast).  Callers must not reuse the argument afterwards; pass a
    copy if the fp32 tree is still needed.
    """
    import jax

    def cast(path, p):
        if not (hasattr(p, "ndim")
                and jnp.issubdtype(p.dtype, jnp.floating)):
            return p
        if p.ndim >= min_ndim:
            return p.astype(dtype)
        names = [str(getattr(k, "key", k)) for k in path]
        if p.ndim == 1 and not any(_NORM_PATH.search(n) for n in names):
            return p.astype(dtype)
        return p

    # one jitted program for the whole tree (not thousands of eager casts —
    # each is a separate dispatch on the remote-compile tunnel); donation
    # lets XLA free each fp32 buffer as soon as its bf16 copy is written
    return jax.jit(
        lambda t: jax.tree_util.tree_map_with_path(cast, t),
        donate_argnums=0)(params)
