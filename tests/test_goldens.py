"""Golden-array parity pack (SURVEY.md §4b): frozen fp32 input/output pairs
so sampler math, schedule tables, tokenizers, and fixed-weight model
forwards survive refactors without torch in the loop. Regenerate with
``python tests/make_goldens.py`` only on deliberate semantic changes.

Runs in seconds (tiny shapes; the heavy compiles are cached)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.make_goldens import (OUT, TRICKY_PROMPTS, linear_denoiser)

GOLD = np.load(OUT)


def test_k_sampler_trajectories_match_goldens():
    from from_ddpm_to_stable_diffusion_tpu.samplers import (KSamplerConfig,
                                                            k_sampler_scan)

    x0 = jnp.asarray(GOLD["sampler_x0"])
    for method in ("k_lms", "k_euler", "k_euler_ancestral"):
        cfg = KSamplerConfig(method=method, n_inference_steps=12)
        out = k_sampler_scan(linear_denoiser, x0, cfg, rng=jax.random.key(7))
        np.testing.assert_allclose(np.asarray(out),
                                   GOLD[f"sampler_{method}"],
                                   rtol=2e-5, atol=1e-6, err_msg=method)


def test_flow_euler_matches_golden():
    from from_ddpm_to_stable_diffusion_tpu.samplers import flow_euler_sample

    out = flow_euler_sample(lambda x, s: x * (1.0 - 0.1 * s),
                            jnp.asarray(GOLD["sampler_x0"]), steps=12,
                            shift=3.0)
    np.testing.assert_allclose(np.asarray(out), GOLD["flow_euler"],
                               rtol=2e-5, atol=1e-6)


def test_flow_heun_matches_golden():
    from from_ddpm_to_stable_diffusion_tpu.samplers.flow import (
        flow_heun_sample)

    out = flow_heun_sample(lambda x, s: x * (1.0 - 0.1 * s),
                           jnp.asarray(GOLD["sampler_x0"]), steps=12,
                           shift=3.0)
    np.testing.assert_allclose(np.asarray(out), GOLD["flow_heun"],
                               rtol=2e-5, atol=1e-6)


def test_schedule_tables_match_goldens():
    from from_ddpm_to_stable_diffusion_tpu.ops import schedules

    sig, ts = schedules.karras_sigma_schedule(12, 1000)
    np.testing.assert_allclose(np.asarray(sig, np.float32),
                               GOLD["karras_sigmas"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ts, np.float32),
                               GOLD["karras_timesteps"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(schedules.lms_coefficients(sig, 4, start_step=0),
                   np.float32), GOLD["lms_coeffs"], rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(schedules.sd3_sigma_schedule(12, 3.0), np.float32),
        GOLD["sd3_sigmas"], rtol=1e-6)


def test_tokenizer_encodings_match_goldens():
    from from_ddpm_to_stable_diffusion_tpu.io.spm_tokenizer import (
        CONTROL, NORMAL, UNKNOWN, SentencePieceUnigram, T5XXLTokenizer)
    from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import (
        CLIPTokenizer, build_simple_vocab)

    vocab, merges = build_simple_vocab(["a", "photo", "of", "cat"])
    clip = CLIPTokenizer(vocab, merges)
    spm = SentencePieceUnigram([
        ("<pad>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
        ("<unk>", 0.0, UNKNOWN), ("▁", -3.0, NORMAL),
        ("▁a", -2.5, NORMAL), ("▁cat", -1.0, NORMAL),
        ("▁photo", -1.2, NORMAL), ("▁of", -1.1, NORMAL),
        ("t", -2.0, NORMAL), ("s", -3.5, NORMAL), ("'", -4.0, NORMAL)])
    t5 = T5XXLTokenizer(spm)
    for i, p in enumerate(TRICKY_PROMPTS):
        np.testing.assert_array_equal(
            np.asarray(clip.encode(p), np.int32), GOLD[f"clip_tokens_{i}"],
            err_msg=f"clip prompt {p!r}")
        np.testing.assert_array_equal(
            np.asarray(t5.encode(p), np.int32), GOLD[f"t5_tokens_{i}"],
            err_msg=f"t5 prompt {p!r}")


@pytest.mark.slow
def test_fixed_weight_forwards_match_goldens():
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)
    from from_ddpm_to_stable_diffusion_tpu.models.tiny_unet import TinyUNet

    unet = TinyUNet(out_channels=3, base_channels=32,
                    channel_mult=(1, 2, 2, 2), num_classes=3)
    xu = jnp.asarray(GOLD["tiny_unet_x"])
    tu = jnp.asarray([3, 500], jnp.int32)
    yu = jnp.asarray([1, 2], jnp.int32)
    pu = unet.init(jax.random.key(2), xu, tu, yu)
    np.testing.assert_allclose(np.asarray(unet.apply(pu, xu, tu, yu)),
                               GOLD["tiny_unet_out"], rtol=2e-5, atol=2e-5)

    cfg = MMDiTConfig(depth=2, pos_embed_max_size=8)
    mmdit = MMDiT(cfg)
    xm = jnp.asarray(GOLD["mmdit_x"])
    tm = jnp.asarray([500.0])
    ym = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 2048)).astype(np.float32))
    cm = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 154, 4096)).astype(np.float32))
    pm = mmdit.init(jax.random.key(6), xm, tm, ym, cm)
    np.testing.assert_allclose(np.asarray(mmdit.apply(pm, xm, tm, ym, cm)),
                               GOLD["mmdit_out"], rtol=2e-5, atol=2e-5)
