"""SDXL-VAE (diffusers AutoencoderKL) import: mapping completeness, the
fused-attention file path, and a latent-DDPM smoke through the imported
encoder (ref 03_.../01_check.py:20-41, 06_.../03_train_with_vae.py:69)."""

import jax
import jax.numpy as jnp
import numpy as np

from from_ddpm_to_stable_diffusion_tpu.io import weights as W
from from_ddpm_to_stable_diffusion_tpu.models.sd1 import (VAEDecoder,
                                                          VAEEncoder)
from tests.test_weights import _invert, _tree_paths
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def _flax_shapes(model, *init_args):
    params = model.init(jax.random.key(0), *init_args)["params"]
    return params, _tree_paths(jax.tree_util.tree_map(np.asarray, params))


def _unfuse_attn(state, prefix):
    """Split the synthetic fused qkv back into diffusers' to_q/to_k/to_v —
    the on-disk layout import_sdxl_vae expects."""
    for part, axis in (("weight", 0), ("bias", 0)):
        fused = state.pop(f"{prefix}.qkv_fused.{part}", None)
        if fused is not None:
            for name, chunk in zip("qkv", np.split(fused, 3, axis=axis)):
                state[f"{prefix}.to_{name}.{part}"] = chunk
    return state


def _synthetic_sdxl_file(tmp_path):
    from safetensors.numpy import save_file

    _, enc_shapes = _flax_shapes(VAEEncoder(), jnp.zeros((1, 32, 32, 3)),
                                 jnp.zeros((1, 4, 4, 4)))
    _, dec_shapes = _flax_shapes(VAEDecoder(), jnp.zeros((1, 4, 4, 4)))
    state = _invert(W.sdxl_vae_encoder_rules(), enc_shapes)
    state.update(_invert(W.sdxl_vae_decoder_rules(), dec_shapes))
    _unfuse_attn(state, "encoder.mid_block.attentions.0")
    _unfuse_attn(state, "decoder.mid_block.attentions.0")
    path = str(tmp_path / "sdxl_vae.safetensors")
    save_file(state, path)
    return path, enc_shapes, dec_shapes


def test_sdxl_vae_import_completeness(tmp_path):
    path, enc_shapes, dec_shapes = _synthetic_sdxl_file(tmp_path)
    enc, dec = W.import_sdxl_vae(path)
    assert _tree_paths(enc) == enc_shapes
    assert _tree_paths(dec) == dec_shapes


def test_sdxl_vae_roundtrip_runs(tmp_path):
    path, _, _ = _synthetic_sdxl_file(tmp_path)
    enc_params, dec_params = W.import_sdxl_vae(path)
    enc, dec = VAEEncoder(), VAEDecoder()
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 32, 32, 3)).astype(np.float32))
    noise = jnp.zeros((1, 4, 4, 4))
    z = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, enc_params)},
                  x, noise)
    assert z.shape == (1, 4, 4, 4)
    y = dec.apply({"params": jax.tree_util.tree_map(jnp.asarray, dec_params)},
                  z)
    assert y.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_latent_ddpm_through_imported_sdxl_vae(tmp_path):
    """Stage-06 latent training wired through the imported autoencoder —
    the reference's 03_train_with_vae.py:69 workload shape."""
    from from_ddpm_to_stable_diffusion_tpu.io import (DataLoader,
                                                      SyntheticImageDataset)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import (
        DDPMTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig

    path, _, _ = _synthetic_sdxl_file(tmp_path)
    enc_params, dec_params = W.import_sdxl_vae(path)
    enc, dec = VAEEncoder(), VAEDecoder()
    enc_tree = {"params": jax.tree_util.tree_map(jnp.asarray, enc_params)}
    dec_tree = {"params": jax.tree_util.tree_map(jnp.asarray, dec_params)}

    def encode(images, rng):
        noise = jax.random.normal(rng, images.shape[:1]
                                  + (images.shape[1] // 8,
                                     images.shape[2] // 8, 4))
        return enc.apply(enc_tree, images, noise)

    def decode(latents):
        return dec.apply(dec_tree, latents)

    cfg = TinySDConfig(epoch=1, batch_size=8, img_size=8, img_channel=4,
                       num_class=3, T=5, channel=32,
                       channel_multy=[1, 2, 2, 2], dropout=0.0,
                       warmup_epochs=1, dtype="fp32")
    trainer = DDPMTrainer(cfg, latent_encode_fn=encode,
                          latent_decode_fn=decode)
    loader = DataLoader(SyntheticImageDataset(n=16, img_size=64),
                        batch_size=8)
    state = trainer.create_state(steps_per_epoch=len(loader))
    rng = jax.random.key(0)
    for images, labels in loader:
        state, loss = trainer.train_step(state, images, labels, rng)
    assert np.isfinite(float(loss))
