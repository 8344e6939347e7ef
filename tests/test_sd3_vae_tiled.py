"""Streamed/tiled SD3 VAE decode vs the whole-image decoder.

The tiled path must be EXACT (up to fp rounding) across strip
boundaries — this is what lets serving decode batch ≥ 4 at 1024²
without per-image serialization (reference decoder:
02_stable_diffusion-3/utils.py:619-687)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.models.sd3_vae import SD3VAEDecoder
from from_ddpm_to_stable_diffusion_tpu.models.sd3_vae_tiled import (
    tiled_decode)

pytestmark = pytest.mark.slow


def _small_decoder(dtype):
    # GroupNorm(32) needs >=32 channels per level -> ch=32 minimum
    dec = SD3VAEDecoder(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                        z_channels=4, dtype=dtype)
    z = jax.random.normal(jax.random.key(1), (2, 4, 4, 4), jnp.float32)
    params = dec.init(jax.random.key(0), z)["params"]
    # non-trivial GN affines so a stats mismatch can't hide
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * np.prod(p.shape) % 7 if p.ndim == 1 else p,
        params)
    return dec, params, z


@pytest.mark.parametrize("dtype,atol", [
    (jnp.float32, 3e-5),
    # bf16: the tiled path re-orders bf16 accumulations (strip convs,
    # one-pass GN stats), and 13 GroupNorms amplify ulp-level input diffs
    # with these random-init gains; fp32 pins the ALGORITHM at 3e-5 and
    # the strip-invariance test below pins seam-freeness exactly
    (jnp.bfloat16, 0.2)])
def test_tiled_decode_matches_whole(dtype, atol):
    dec, params, z = _small_decoder(dtype)
    want = dec.apply({"params": params}, z)        # (2, 32, 32, 3)
    got = tiled_decode(params, z, ch=32, ch_mult=(1, 2, 4, 4),
                       num_res_blocks=2, dtype=dtype, strip=8)
    assert got.shape == want.shape
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.max() < atol, err.max()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_tiled_decode_strip_invariance_no_seams(dtype):
    """Strip boundaries introduce NO error: strip=8 (3 interior seams at
    the output resolution, more at intermediate ones) must equal a
    single-strip run, where every conv sees the whole image at once."""
    dec, params, z = _small_decoder(dtype)
    small = tiled_decode(params, z, ch=32, ch_mult=(1, 2, 4, 4),
                         num_res_blocks=2, dtype=dtype, strip=8)
    whole = tiled_decode(params, z, ch=32, ch_mult=(1, 2, 4, 4),
                         num_res_blocks=2, dtype=dtype, strip=4096)
    np.testing.assert_allclose(np.asarray(small), np.asarray(whole),
                               atol=5e-6)


def test_tiled_decode_image_subbatch():
    dec, params, z = _small_decoder(jnp.float32)
    whole = tiled_decode(params, z, ch=32, ch_mult=(1, 2, 4, 4),
                         num_res_blocks=2, dtype=jnp.float32, strip=8)
    sub = tiled_decode(params, z, ch=32, ch_mult=(1, 2, 4, 4),
                       num_res_blocks=2, dtype=jnp.float32, strip=8,
                       image_batch=1)
    # batch-1 programs vectorize reductions differently than batch-2 —
    # pure fp rounding; per-image independence is the semantic claim
    np.testing.assert_allclose(np.asarray(sub), np.asarray(whole),
                               atol=1e-3)


def test_tiled_decode_accepts_wrapped_params():
    dec, params, z = _small_decoder(jnp.float32)
    got = tiled_decode({"params": params}, z, ch=32, ch_mult=(1, 2, 4, 4),
                       num_res_blocks=2, dtype=jnp.float32, strip=16)
    assert got.shape == (2, 32, 32, 3)


def test_inferencer_vae_decode_tiled_matches_whole():
    """Pipeline wiring: SD3Inferencer.vae_decode(mode="tiled") must agree
    with the per-image whole decode (uint8, off-by-one fp budget)."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import (
        SD3Inferencer, SD3Models)
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        CLIPTextConfig, T5Config)

    models = SD3Models.initialize(
        jax.random.key(0), dtype="fp32", depth=2, pos_embed_max_size=16,
        with_t5=False,
        clip_l_cfg=CLIPTextConfig(vocab_size=64, hidden_size=768,
                                  num_layers=2, num_heads=4),
        clip_g_cfg=CLIPTextConfig(vocab_size=64, hidden_size=1280,
                                  num_layers=2, num_heads=4,
                                  hidden_act="gelu"))
    inf = SD3Inferencer(models, shift=3.0)
    latent = jax.random.normal(jax.random.key(3), (2, 8, 8, 16)) * 0.5
    whole = inf.vae_decode(latent, mode="whole")
    tiled = inf.vae_decode(latent, mode="tiled")
    assert whole.shape == tiled.shape == (2, 64, 64, 3)
    assert whole.dtype == tiled.dtype == np.uint8
    diff = np.abs(whole.astype(np.int32) - tiled.astype(np.int32))
    assert diff.max() <= 1, diff.max()
