"""Serving dtype policy: norm params must stay fp32 through the cast.

cast_params_for_inference keeps norm-layer 1-D params fp32 by a path-name
pattern (utils/dtypes.py::_NORM_PATH).  These tests pin the convention
STRUCTURALLY on real model trees: a leaf module whose params are only 1-D
{scale, bias} is a norm layer (Dense/Conv modules always carry a 'kernel'),
so a future norm module named outside the pattern fails here instead of
silently serving bf16 statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.utils.dtypes import (
    cast_params_for_inference)

pytestmark = pytest.mark.slow  # model inits


def _norm_module_paths(tree, prefix=()):
    """Paths of leaf-module dicts that look like norm layers: every param
    is 1-D and the key set is within {scale, bias}."""
    found = []
    if isinstance(tree, dict):
        vals = list(tree.values())
        if (vals and set(tree) <= {"scale", "bias"}
                and all(hasattr(v, "ndim") and v.ndim == 1 for v in vals)):
            found.append(prefix)
        else:
            for k, v in tree.items():
                found.extend(_norm_module_paths(v, prefix + (k,)))
    return found


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _assert_cast_policy(params):
    norm_paths = _norm_module_paths(params)
    assert norm_paths, "model has no norm layers? test is vacuous"
    cast = cast_params_for_inference(dict(params), dtype=jnp.bfloat16)
    for path in norm_paths:
        for name, p in _get(cast, path).items():
            assert p.dtype == jnp.float32, (
                f"norm param {'/'.join(path)}/{name} was cast to {p.dtype} "
                "— the _NORM_PATH pattern missed it")
    # and everything that is NOT a norm param must actually be bf16
    norm_set = set(norm_paths)

    def check(kp, p):
        path = tuple(str(getattr(k, "key", k)) for k in kp[:-1])
        if path in norm_set or not jnp.issubdtype(p.dtype, jnp.floating):
            return
        assert p.dtype == jnp.bfloat16, f"{path} stayed {p.dtype}"

    jax.tree_util.tree_map_with_path(check, cast)


def test_tiny_unet_norm_params_stay_fp32():
    from from_ddpm_to_stable_diffusion_tpu.models.tiny_unet import TinyUNet

    model = TinyUNet(base_channels=32, num_classes=3, num_heads=4)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x, jnp.asarray([1]),
                        jnp.asarray([1]))["params"]
    _assert_cast_policy(params)


def test_mmdit_qknorm_params_stay_fp32():
    # MMDiT-medium's adaLN LayerNorms are affine-free (no params); the
    # rmsnorm qk variant is the one with learned norm scales.
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    model = MMDiT(MMDiTConfig(depth=2, pos_embed_max_size=8,
                              qk_norm="rms"))
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 16)), jnp.asarray([100.0]),
        jnp.zeros((1, 2048)), jnp.zeros((1, 154, 4096)))["params"]
    _assert_cast_policy(params)


def test_clip_text_norm_params_stay_fp32():
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        CLIPTextConfig, CLIPTextModel)

    cfg = CLIPTextConfig(vocab_size=128, hidden_size=64, num_layers=2,
                         num_heads=4)
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 77), jnp.int32))["params"]
    _assert_cast_policy(params)


def test_vae_decoder_norm_params_stay_fp32():
    from from_ddpm_to_stable_diffusion_tpu.models.sd1 import VAEDecoder

    model = VAEDecoder()
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)))["params"]
    _assert_cast_policy(params)
