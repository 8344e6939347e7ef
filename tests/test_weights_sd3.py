"""SD3 weight-mapping completeness tests (roundtrip vs Flax init trees)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.io import weights as W
from from_ddpm_to_stable_diffusion_tpu.io import weights_sd3 as W3
from tests.test_weights import _invert, _tree_paths


def _roundtrip(model, init_args, rules):
    params = model.init(jax.random.key(0), *init_args)["params"]
    flax_shapes = _tree_paths(jax.tree_util.tree_map(np.asarray, params))
    state = _invert(rules, flax_shapes)
    imported = W.apply_rules(state, rules)
    got = _tree_paths(imported)
    assert got == flax_shapes, (
        f"missing: {sorted(set(flax_shapes) - set(got))[:6]} "
        f"extra: {sorted(set(got) - set(flax_shapes))[:6]}")
    model.apply({"params": jax.tree_util.tree_map(jnp.asarray, imported)},
                *init_args)


@pytest.mark.slow  # full-model compile dominates
def test_mmdit_mapping_roundtrip():
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

    cfg = MMDiTConfig(depth=3, pos_embed_max_size=8, qk_norm="rms")
    model = MMDiT(cfg)
    _roundtrip(model,
               (jnp.zeros((1, 8, 8, 16)), jnp.zeros((1,)),
                jnp.zeros((1, 2048)), jnp.zeros((1, 154, 4096))),
               W3.sd3_mmdit_rules(depth=3, qk_norm=True))


def test_t5_mapping_roundtrip():
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        T5Config, T5Encoder)

    cfg = T5Config(vocab_size=50, d_model=32, d_ff=64, num_layers=2,
                   num_heads=4)
    _roundtrip(T5Encoder(cfg), (jnp.zeros((1, 8), jnp.int32),),
               W3.sd3_t5_rules(num_layers=2))


def test_hf_clip_mapping_roundtrip():
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        CLIPTextConfig, CLIPTextModel)

    cfg = CLIPTextConfig(vocab_size=50, hidden_size=32, num_layers=2,
                         num_heads=4)
    model = CLIPTextModel(cfg, intermediate_output=-2)
    _roundtrip(model, (jnp.zeros((1, 77), jnp.int32),),
               W3.hf_clip_text_rules(num_layers=2))


def test_sd3_vae_mapping_roundtrip():
    from from_ddpm_to_stable_diffusion_tpu.models.sd3_vae import (
        SD3VAEDecoder, SD3VAEEncoder)

    enc = SD3VAEEncoder(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)
    _roundtrip(enc, (jnp.zeros((1, 16, 16, 3)),),
               W3.sd3_vae_encoder_rules(ch_mult=(1, 2), num_res_blocks=1))
    dec = SD3VAEDecoder(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)
    _roundtrip(dec, (jnp.zeros((1, 8, 8, 4)),),
               W3.sd3_vae_decoder_rules(ch_mult=(1, 2), num_res_blocks=1))


def test_fuse_qkv():
    state = {
        "a.q.weight": np.ones((4, 8)), "a.k.weight": 2 * np.ones((4, 8)),
        "a.v.weight": 3 * np.ones((4, 8)),
        "a.q.bias": np.zeros(4), "a.k.bias": np.ones(4),
        "a.v.bias": 2 * np.ones(4),
    }
    W3.fuse_qkv(state, "a.q", "a.k", "a.v", "a.in_proj")
    assert state["a.in_proj.weight"].shape == (12, 8)
    np.testing.assert_allclose(state["a.in_proj.weight"][4:8], 2.0)
    np.testing.assert_allclose(state["a.in_proj.bias"][8:], 2.0)
    assert "a.q.weight" not in state


def test_fuse_sd3_vae_attn_conv1x1():
    state = {
        "m.q.weight": np.ones((8, 8, 1, 1)),
        "m.k.weight": np.ones((8, 8, 1, 1)),
        "m.v.weight": np.ones((8, 8, 1, 1)),
        "m.q.bias": np.zeros(8), "m.k.bias": np.zeros(8),
        "m.v.bias": np.zeros(8),
        "m.proj_out.weight": np.ones((8, 8, 1, 1)),
        "m.proj_out.bias": np.zeros(8),
    }
    W3.fuse_sd3_vae_attn(state, "m")
    assert state["m.in_proj.weight"].shape == (24, 8)
    assert state["m.proj_out_dense.weight"].shape == (8, 8)


def test_sniffed_config_drives_rules():
    """End-to-end: sniff a synthetic mini checkpoint then import it."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import MMDiT
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import sniff_mmdit_config

    # build a synthetic 'checkpoint' for depth=2, patch 2, 16ch, pos 8
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import MMDiTConfig

    cfg = MMDiTConfig(depth=2, pos_embed_max_size=8)
    model = MMDiT(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 16)),
                        jnp.zeros((1,)), jnp.zeros((1, 2048)),
                        jnp.zeros((1, 154, 4096)))["params"]
    flax_shapes = _tree_paths(jax.tree_util.tree_map(np.asarray, params))
    rules = W3.sd3_mmdit_rules(depth=2, qk_norm=False)
    state = {f"model.diffusion_model.{k}": v
             for k, v in _invert(rules, flax_shapes).items()}
    sniffed = sniff_mmdit_config(state)
    assert sniffed.depth == 2
    assert sniffed.patch_size == 2
    assert sniffed.pos_embed_max_size == 8
    assert sniffed.qk_norm is None
