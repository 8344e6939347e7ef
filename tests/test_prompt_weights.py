"""Prompt attention-weight syntax: parser, tokenizer fan-out, application.

Beyond-reference feature (the reference stubs all token weights to 1.0,
02_stable_diffusion-3/utils.py:206-226); semantics follow the community
``(text)``/``[text]``/``(text:w)`` convention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.io.prompt_weights import (
    apply_token_weights, batch_encode_with_weights, encode_with_weights,
    parse_weighted_segments)
from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import (CLIPTokenizer,
                                                            build_simple_vocab)


@pytest.fixture(scope="module")
def tok():
    vocab, merges = build_simple_vocab(
        ["hello", "world", "cat", "photo", "of", "a", "dog"])
    return CLIPTokenizer(vocab, merges)


# ---------------------------------------------------------------- parser
def test_plain_text_is_identity():
    assert parse_weighted_segments("a photo of a cat") == [
        ("a photo of a cat", 1.0)]


def test_round_brackets_boost():
    segs = parse_weighted_segments("a (cat) dog")
    assert segs == [("a ", 1.0), ("cat", 1.1), (" dog", 1.0)]


def test_square_brackets_dampen():
    segs = parse_weighted_segments("a [cat]")
    assert segs[1] == ("cat", pytest.approx(1 / 1.1))


def test_explicit_weight():
    segs = parse_weighted_segments("a (cat:1.5) dog")
    assert ("cat", 1.5) in segs


def test_nesting_multiplies():
    segs = parse_weighted_segments("((cat))")
    assert segs == [("cat", pytest.approx(1.1 * 1.1))]


def test_nested_explicit_and_round():
    segs = parse_weighted_segments("(a (cat:2.0) b)")
    assert segs == [("a ", pytest.approx(1.1)),
                    ("cat", pytest.approx(2.0 * 1.1)),
                    (" b", pytest.approx(1.1))]


def test_escaped_brackets_are_literal():
    segs = parse_weighted_segments(r"a \(cat\)")
    assert segs == [("a (cat)", 1.0)]


def test_unbalanced_close_is_literal():
    assert parse_weighted_segments("a cat)") == [("a cat)", 1.0)]


def test_unbalanced_open_degrades():
    # open paren never closed: content keeps weight 1.0
    assert parse_weighted_segments("a (cat") == [("a cat", 1.0)]


def test_negative_and_fractional_weights():
    assert parse_weighted_segments("(x:0.25)") == [("x", 0.25)]
    assert parse_weighted_segments("(x:-1)") == [("x", -1.0)]


# ------------------------------------------------------------- tokenizer
def test_encode_with_weights_matches_plain_encode(tok):
    """Without syntax, ids must equal the plain encode (weights all 1)."""
    ids, w = encode_with_weights(tok, "hello world")
    assert ids == tok.encode("hello world")
    assert w == [1.0] * 77


def test_encode_with_weights_marks_tokens(tok):
    ids, w = encode_with_weights(tok, "hello (world:1.5)")
    plain = tok.encode("hello world")
    assert ids == plain  # syntax chars don't leak into ids
    n_world = len(tok.encode_fragment("world"))
    n_hello = len(tok.encode_fragment("hello"))
    assert w[0] == 1.0  # BOS
    assert all(x == 1.0 for x in w[1:1 + n_hello])
    assert all(x == 1.5 for x in w[1 + n_hello:1 + n_hello + n_world])
    assert all(x == 1.0 for x in w[1 + n_hello + n_world:])  # EOS+pad


def test_tokenize_with_weights_paths(tok):
    stub = tok.tokenize_with_weights("(hello:2.0)")
    assert all(w == 1.0 for _, w in stub)  # reference-parity default
    real = tok.tokenize_with_weights("(hello:2.0)", parse_weights=True)
    assert any(w == 2.0 for _, w in real)
    # syntax chars are stripped from the weighted ids
    assert [t for t, _ in real] == tok.encode("hello")


def test_batch_encode(tok):
    ids, w = batch_encode_with_weights(tok, ["hello", "(world:1.2)"])
    assert np.asarray(ids).shape == (2, 77)
    assert np.asarray(w).shape == (2, 77)


# ------------------------------------------------------------ application
def test_apply_unit_weights_is_identity():
    z = jax.random.normal(jax.random.key(0), (2, 77, 8))
    out = apply_token_weights(z, jnp.ones((2, 77)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(z), rtol=1e-6)


def test_apply_preserves_mean_and_scales():
    z = jax.random.normal(jax.random.key(1), (1, 8, 4)) + 0.3
    w = jnp.ones((1, 8)).at[0, 3].set(2.0)
    out = apply_token_weights(z, w)
    np.testing.assert_allclose(np.asarray(out.mean()), np.asarray(z.mean()),
                               rtol=1e-5)
    # the boosted token moved away from its neighbours
    assert not np.allclose(np.asarray(out[0, 3]), np.asarray(z[0, 3]))


# --------------------------------------------------------------- pipeline
@pytest.mark.slow  # full-model compile dominates
def test_sd1_generate_prompt_weighting_smoke(tok):
    from from_ddpm_to_stable_diffusion_tpu.models.sd1 import (
        CLIPText, SD1UNet, VAEDecoder, VAEEncoder)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import generate

    class M:
        clip = CLIPText(vocab_size=512, num_layers=1, num_heads=4,
                        embed_dim=768)
        unet = SD1UNet(model_channels=32, num_heads=4)
        encoder = VAEEncoder()
        decoder = VAEDecoder()

    m = M()
    k = jax.random.split(jax.random.key(0), 4)
    m.params = {
        "clip": m.clip.init(k[0], jnp.zeros((1, 77), jnp.int32))["params"],
        "unet": m.unet.init(k[1], jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros((1, 77, 768)),
                            jnp.zeros((1, 320)))["params"],
        "encoder": m.encoder.init(k[2], jnp.zeros((1, 64, 64, 3)),
                                  jnp.zeros((1, 8, 8, 4)))["params"],
        "decoder": m.decoder.init(k[3], jnp.zeros((1, 8, 8, 4)))["params"],
    }
    out = generate(["a (cat:1.4)"], m, tokenizer=tok, height=64, width=64,
                   n_inference_steps=2, seed=0, prompt_weighting=True)
    assert out.shape == (1, 64, 64, 3)
    # weighting changes the denoised latents vs the plain prompt (compare
    # latents — a tiny random decoder can saturate the uint8 image)
    zw = generate(["a (cat:1.4)"], m, tokenizer=tok, height=64, width=64,
                  n_inference_steps=2, seed=0, prompt_weighting=True,
                  return_latents=True)
    zb = generate(["a cat"], m, tokenizer=tok, height=64, width=64,
                  n_inference_steps=2, seed=0, return_latents=True)
    assert not np.allclose(np.asarray(zw), np.asarray(zb))
    # and weighting with no syntax in the prompt is a no-op
    zp = generate(["a cat"], m, tokenizer=tok, height=64, width=64,
                  n_inference_steps=2, seed=0, prompt_weighting=True,
                  return_latents=True)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zb),
                               rtol=2e-2, atol=2e-3)
