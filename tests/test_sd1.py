"""SD1 model + pipeline tests at reduced size (shape/structure contracts).

Full-size parity against the torch reference needs the released SD1
checkpoint, which does not ship in this environment; these tests pin the
shape contracts from the reference's 01_check.py and pipeline walkthrough.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.models.sd1 import (
    CLIPText, SD1UNet, VAEDecoder, VAEEncoder)

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def test_clip_text_shapes():
    model = CLIPText(vocab_size=64, num_layers=2, num_heads=4, embed_dim=64)
    tokens = jnp.zeros((2, 77), jnp.int32)
    params = model.init(jax.random.key(0), tokens)
    out = model.apply(params, tokens)
    assert out.shape == (2, 77, 64)


def test_clip_causality():
    """Changing a later token must not affect earlier positions."""
    model = CLIPText(vocab_size=64, num_layers=2, num_heads=4, embed_dim=64)
    t1 = jnp.zeros((1, 77), jnp.int32)
    t2 = t1.at[0, 50].set(7)
    params = model.init(jax.random.key(0), t1)
    o1 = model.apply(params, t1)
    o2 = model.apply(params, t2)
    np.testing.assert_allclose(np.asarray(o1[0, :50]), np.asarray(o2[0, :50]),
                               atol=1e-5)
    assert np.abs(np.asarray(o1[0, 50:]) - np.asarray(o2[0, 50:])).max() > 0


def test_sd1_unet_shapes():
    """Random-tensor shape test mirroring 01_check.py check_diffusion."""
    model = SD1UNet(model_channels=32, num_heads=4)
    x = jnp.zeros((1, 32, 32, 4))
    ctx = jnp.zeros((1, 77, 768))
    t = jnp.zeros((1, 320))
    params = model.init(jax.random.key(0), x, ctx, t)
    out = model.apply(params, x, ctx, t)
    assert out.shape == (1, 32, 32, 4)
    assert out.dtype == jnp.float32


def test_vae_roundtrip_shapes():
    enc = VAEEncoder()
    dec = VAEDecoder()
    x = jnp.zeros((1, 64, 64, 3))
    noise = jnp.zeros((1, 8, 8, 4))
    ep = enc.init(jax.random.key(0), x, noise)
    z = enc.apply(ep, x, noise)
    assert z.shape == (1, 8, 8, 4)  # 64/8 spatial, 4 latent channels
    dp = dec.init(jax.random.key(1), z)
    y = dec.apply(dp, z)
    assert y.shape == x.shape


def test_vae_encoder_asymmetric_padding():
    """Encoder downsampling halves exactly (floor((H+1-3)/2)+1 = H/2)."""
    enc = VAEEncoder()
    x = jnp.zeros((1, 32, 32, 3))
    noise = jnp.zeros((1, 4, 4, 4))
    params = enc.init(jax.random.key(0), x, noise)
    z = enc.apply(params, x, noise)
    assert z.shape == (1, 4, 4, 4)


class _FakeModels:
    """Tiny random-weight SD1 bundle for pipeline contract tests."""

    def __init__(self):
        from from_ddpm_to_stable_diffusion_tpu.models import sd1 as sd1_models

        self.clip = CLIPText(vocab_size=64, num_layers=1, num_heads=4,
                             embed_dim=768)
        self.unet = SD1UNet(model_channels=32, num_heads=4)
        self.encoder = VAEEncoder()
        self.decoder = VAEDecoder()
        k = jax.random.split(jax.random.key(0), 4)
        self.params = {
            "clip": self.clip.init(k[0], jnp.zeros((1, 77), jnp.int32))["params"],
            "unet": self.unet.init(k[1], jnp.zeros((1, 8, 8, 4)),
                                   jnp.zeros((1, 77, 768)),
                                   jnp.zeros((1, 320)))["params"],
            "encoder": self.encoder.init(k[2], jnp.zeros((1, 64, 64, 3)),
                                         jnp.zeros((1, 8, 8, 4)))["params"],
            "decoder": self.decoder.init(k[3], jnp.zeros((1, 8, 8, 4)))["params"],
        }


@pytest.fixture(scope="module")
def fake_models():
    return _FakeModels()


@pytest.mark.parametrize("sampler", ["k_lms", "k_euler", "k_euler_ancestral", "dpmpp_2m"])
def test_generate_contract(fake_models, sampler):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import generate

    out = generate(["a cat"], fake_models, tokenizer=None, height=64,
                   width=64, sampler=sampler, n_inference_steps=3, seed=1)
    assert out.shape == (1, 64, 64, 3)
    assert out.dtype == np.uint8


@pytest.mark.parametrize("sampler", ["k_lms", "k_euler", "k_euler_ancestral", "dpmpp_2m"])
def test_sd1_generator_matches_generate(fake_models, sampler):
    """The compile-once SD1Generator must reproduce generate() exactly
    (same stages, same math — only the compile-unit boundary differs)."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (SD1Generator,
                                                                 generate)

    want = generate(["a cat"], fake_models, tokenizer=None, height=64,
                    width=64, sampler=sampler, n_inference_steps=3, seed=7)
    gen = SD1Generator(fake_models, sampler=sampler, n_inference_steps=3,
                       height=64, width=64)
    got = gen(["a cat"], seed=7)
    # scan and jit_step are different XLA programs; fp reassociation can
    # flip a pixel sitting exactly on a uint8 quantization boundary
    np.testing.assert_allclose(got.astype(np.int16), want.astype(np.int16),
                               atol=1)
    # second call reuses the cached executable — bit-identical to the first
    np.testing.assert_array_equal(gen(["a cat"], seed=7), got)


@pytest.mark.parametrize("sampler", ["k_lms", "k_euler_ancestral"])
def test_sd1_generator_trajectory_loop(fake_models, sampler):
    """loop="trajectory" (whole denoise loop as ONE jitted scan, params as
    runtime args) must reproduce the per-step dispatch loop exactly —
    same sampler math, only the compile-unit boundary differs."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import SD1Generator

    kw = dict(sampler=sampler, n_inference_steps=4, height=64, width=64)
    want = SD1Generator(fake_models, **kw)(["a cat"], seed=3)
    got = SD1Generator(fake_models, loop="trajectory", **kw)(["a cat"],
                                                             seed=3)
    np.testing.assert_allclose(got.astype(np.int16), want.astype(np.int16),
                               atol=1)
    with pytest.raises(ValueError):
        SD1Generator(fake_models, loop="bogus", **kw)


def test_generate_img2img(fake_models):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import generate

    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    out = generate(["a cat"], fake_models, input_images=[img], strength=0.6,
                   height=64, width=64, n_inference_steps=5, seed=1)
    assert out.shape == (1, 64, 64, 3)


def test_generate_validation(fake_models):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import generate

    with pytest.raises(ValueError):
        generate([], fake_models)
    with pytest.raises(ValueError):
        generate(["a"], fake_models, uncond_prompts=["x", "y"])
    with pytest.raises(ValueError):
        generate(["a"], fake_models, height=100)
    with pytest.raises(ValueError):
        generate(["a"], fake_models, sampler="ddim")
    with pytest.raises(ValueError):
        generate(["a"], fake_models, strength=0.0)


def test_generate_deterministic_per_seed(fake_models):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import generate

    a = generate(["a"], fake_models, height=64, width=64,
                 n_inference_steps=2, seed=42)
    b = generate(["a"], fake_models, height=64, width=64,
                 n_inference_steps=2, seed=42)
    c = generate(["a"], fake_models, height=64, width=64,
                 n_inference_steps=2, seed=43)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a.astype(int) - c.astype(int)).max() > 0


def test_sd1_generator_img2img_matches_generate(fake_models):
    """Serving-path img2img (partial trajectory through the SAME step
    executable machinery) must reproduce generate()'s img2img branch."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (SD1Generator,
                                                                 generate)

    img = np.random.default_rng(3).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)
    want = generate(["a cat"], fake_models, input_images=[img],
                    strength=0.6, height=64, width=64,
                    n_inference_steps=5, seed=9)
    gen = SD1Generator(fake_models, n_inference_steps=5,
                       height=64, width=64)
    got = gen(["a cat"], seed=9, input_images=[img], strength=0.6)
    np.testing.assert_allclose(got.astype(np.int16), want.astype(np.int16),
                               atol=1)
    # txt2img on the same generator still works (separate step cache key)
    assert gen(["a cat"], seed=9).shape == (1, 64, 64, 3)
