"""SD3 stack tests at reduced size: MMDiT, text encoders, VAE, pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                            MMDiTConfig,
                                                            modulate)
from from_ddpm_to_stable_diffusion_tpu.models.sd3_vae import (
    SD3LatentFormat, SD3VAEDecoder, SD3VAEEncoder, SDVAE)
from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
    CLIPTextConfig, CLIPTextModel, T5Config, T5Encoder, assemble_sd3_cond,
    t5_relative_position_bucket)


def test_mmdit_shapes():
    cfg = MMDiTConfig(depth=2, pos_embed_max_size=16)  # hidden 128, heads 2
    model = MMDiT(cfg)
    x = jnp.zeros((2, 16, 16, 16))
    t = jnp.asarray([0.5, 999.0])
    y = jnp.zeros((2, 2048))
    ctx = jnp.zeros((2, 154, 4096))
    params = model.init(jax.random.key(0), x, t, y, ctx)
    out = model.apply(params, x, t, y, ctx)
    assert out.shape == x.shape  # (B, H, W, 16), latent-shaped output


def test_mmdit_variable_resolution():
    """cropped_pos_embed must support any resolution ≤ max grid."""
    cfg = MMDiTConfig(depth=2, pos_embed_max_size=16)
    model = MMDiT(cfg)
    x16 = jnp.zeros((1, 16, 16, 16))
    t = jnp.zeros((1,))
    y = jnp.zeros((1, 2048))
    ctx = jnp.zeros((1, 154, 4096))
    params = model.init(jax.random.key(0), x16, t, y, ctx)
    out = model.apply(params, jnp.zeros((1, 8, 24, 16)), t, y, ctx)
    assert out.shape == (1, 8, 24, 16)


def test_modulate():
    x = jnp.ones((1, 3, 4))
    shift = jnp.full((1, 4), 2.0)
    scale = jnp.full((1, 4), 0.5)
    out = modulate(x, shift, scale)
    np.testing.assert_allclose(np.asarray(out), 3.5)


def test_t5_bucket_matches_torch_oracle():
    """Port of _relative_position_bucket must agree with the torch math."""
    import math

    def torch_bucket(relative_position, num_buckets=32, max_distance=128):
        relative_buckets = 0
        num_buckets //= 2
        relative_buckets += (relative_position > 0).to(torch.long) * num_buckets
        relative_position = torch.abs(relative_position)
        max_exact = num_buckets // 2
        is_small = relative_position < max_exact
        rp_large = max_exact + (
            torch.log(relative_position.float() / max_exact)
            / math.log(max_distance / max_exact) * (num_buckets - max_exact)
        ).to(torch.long)
        rp_large = torch.min(rp_large, torch.full_like(rp_large, num_buckets - 1))
        return relative_buckets + torch.where(is_small, relative_position,
                                              rp_large)

    rel = np.arange(-300, 301).reshape(1, -1)
    got = np.asarray(t5_relative_position_bucket(jnp.asarray(rel)))
    want = torch_bucket(torch.tensor(rel)).numpy()
    np.testing.assert_array_equal(got, want)


def test_t5_encoder_shapes():
    cfg = T5Config(vocab_size=100, d_model=64, d_ff=128, num_layers=2,
                   num_heads=4)
    model = T5Encoder(cfg)
    tokens = jnp.zeros((2, 77), jnp.int32)
    params = model.init(jax.random.key(0), tokens)
    out = model.apply(params, tokens)
    assert out.shape == (2, 77, 64)


def test_clip_text_model_tap_and_pool():
    cfg = CLIPTextConfig(vocab_size=64, hidden_size=32, num_layers=3,
                         num_heads=4)
    model = CLIPTextModel(cfg, intermediate_output=-2)
    tokens = jnp.asarray([[1, 5, 63, 0, 0] + [0] * 72])
    params = model.init(jax.random.key(0), tokens)
    last, intermediate, pooled = model.apply(params, tokens)
    assert last.shape == (1, 77, 32)
    assert intermediate.shape == (1, 77, 32)
    assert pooled.shape == (1, 32)
    # tap is pre-final-LN, so must differ from the final states
    assert np.abs(np.asarray(last) - np.asarray(intermediate)).max() > 0


def test_assemble_sd3_cond_shapes():
    b = 2
    ctx, pooled = assemble_sd3_cond(
        jnp.zeros((b, 77, 768)), jnp.zeros((b, 768)),
        jnp.zeros((b, 77, 1280)), jnp.zeros((b, 1280)),
        jnp.zeros((b, 77, 4096)))
    assert ctx.shape == (b, 154, 4096)
    assert pooled.shape == (b, 2048)


def test_sd3_vae_roundtrip():
    enc = SD3VAEEncoder()
    dec = SD3VAEDecoder()
    x = jnp.zeros((1, 32, 32, 3))
    ep = enc.init(jax.random.key(0), x)
    h = enc.apply(ep, x)
    assert h.shape == (1, 4, 4, 32)  # 2×16 mean|log_var
    z = jnp.zeros((1, 4, 4, 16))
    dp = dec.init(jax.random.key(1), z)
    y = dec.apply(dp, z)
    assert y.shape == (1, 32, 32, 3)


def test_latent_format_roundtrip():
    z = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 16),
                                                             ).astype(np.float32))
    back = SD3LatentFormat.process_out(SD3LatentFormat.process_in(z))
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-6)
    preview = SD3LatentFormat.decode_latent_to_preview(z)
    assert preview.shape == (1, 4, 4, 3) and preview.dtype == jnp.uint8


def test_sniff_mmdit_config():
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import sniff_mmdit_config

    state = {
        "model.diffusion_model.x_embedder.proj.weight":
            np.zeros((1536, 16, 2, 2)),
        "model.diffusion_model.pos_embed": np.zeros((1, 192 * 192, 1536)),
        "model.diffusion_model.y_embedder.mlp.0.weight":
            np.zeros((1536, 2048)),
        "model.diffusion_model.context_embedder.weight":
            np.zeros((1536, 4096)),
    }
    cfg = sniff_mmdit_config(state)
    assert cfg.patch_size == 2
    assert cfg.in_channels == 16
    assert cfg.depth == 24
    assert cfg.pos_embed_max_size == 192
    assert cfg.adm_in_channels == 2048
    assert cfg.context_dim == 4096
    assert cfg.qk_norm is None


def test_sd3_pipeline_end_to_end_tiny():
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import T5Config
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import (SD3Inferencer,
                                                                 SD3Models)
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        CLIPTextConfig)

    models = SD3Models.initialize(
        jax.random.key(0), dtype="fp32", depth=2, pos_embed_max_size=16,
        clip_l_cfg=CLIPTextConfig(vocab_size=64, hidden_size=768,
                                  num_layers=2, num_heads=4),
        clip_g_cfg=CLIPTextConfig(vocab_size=64, hidden_size=1280,
                                  num_layers=2, num_heads=4,
                                  hidden_act="gelu"),
        t5_config=T5Config(vocab_size=64, d_model=4096, d_ff=64,
                           num_layers=1, num_heads=4))
    inf = SD3Inferencer(models, shift=3.0)
    tokens = np.zeros((1, 77), np.int32)
    img = inf.gen_image(tokens, t5_tokens=tokens, width=128, height=128,
                        steps=2, cfg_scale=5.0, seed=1)
    assert img.shape == (1, 128, 128, 3)
    assert img.dtype == np.uint8
