"""Generate the golden-array parity pack (tests/goldens/goldens.npz).

Run from the repo root: ``python tests/make_goldens.py``. Freezes fp32
input/output pairs for the numerical contracts that must survive refactors
without torch in the loop (SURVEY.md §4b):

- all three k-sampler trajectories + the rectified-flow Euler trajectory
  under a fixed linear denoiser,
- DDPM q-sample and one reverse step's coefficient tables,
- CLIP-BPE and SentencePiece-unigram encodings of tricky prompts,
- a fixed-weight TinyUNet forward and a fixed-weight MMDiT forward.

Regenerate ONLY when a deliberate semantic change is made; the diff of this
file is then the reviewable record of what changed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from from_ddpm_to_stable_diffusion_tpu.io.spm_tokenizer import (
    CONTROL, NORMAL, UNKNOWN, SentencePieceUnigram, T5XXLTokenizer)
from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import (CLIPTokenizer,
                                                            build_simple_vocab)
from from_ddpm_to_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
from from_ddpm_to_stable_diffusion_tpu.models.tiny_unet import TinyUNet
from from_ddpm_to_stable_diffusion_tpu.ops import schedules
from from_ddpm_to_stable_diffusion_tpu.samplers import (
    KSamplerConfig, ddpm_loss, flow_euler_sample, k_sampler_scan,
    sigma_tables)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens",
                   "goldens.npz")

TRICKY_PROMPTS = [
    "a photo of a cat",
    "  A   photo\tof a CAT!!  ",
    "cat's éclair — café ☃",
    "",
]


def linear_denoiser(x, t):
    return 0.1 * x + 0.01 * jnp.asarray(t, x.dtype)


def main():
    g = {}
    x0 = np.random.default_rng(0).standard_normal((1, 8, 8, 4)).astype(
        np.float32)
    g["sampler_x0"] = x0
    for method in ("k_lms", "k_euler", "k_euler_ancestral"):
        cfg = KSamplerConfig(method=method, n_inference_steps=12)
        out = k_sampler_scan(linear_denoiser, jnp.asarray(x0), cfg,
                             rng=jax.random.key(7))
        g[f"sampler_{method}"] = np.asarray(out)
    g["flow_euler"] = np.asarray(flow_euler_sample(
        lambda x, s: x * (1.0 - 0.1 * s), jnp.asarray(x0), steps=12,
        shift=3.0))
    from from_ddpm_to_stable_diffusion_tpu.samplers.flow import (
        flow_heun_sample)

    g["flow_heun"] = np.asarray(flow_heun_sample(
        lambda x, s: x * (1.0 - 0.1 * s), jnp.asarray(x0), steps=12,
        shift=3.0))

    # schedule tables (host float64 → fp32 freeze)
    sig, ts = schedules.karras_sigma_schedule(12, 1000)
    g["karras_sigmas"] = np.asarray(sig, np.float32)
    g["karras_timesteps"] = np.asarray(ts, np.float32)
    g["lms_coeffs"] = np.asarray(
        schedules.lms_coefficients(sig, 4, start_step=0), np.float32)
    g["sd3_sigmas"] = np.asarray(
        schedules.sd3_sigma_schedule(12, 3.0), np.float32)

    # tokenizers
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
        g[f"clip_tokens_{i}"] = np.asarray(clip.encode(p), np.int32)
        g[f"t5_tokens_{i}"] = np.asarray(t5.encode(p), np.int32)

    # fixed-weight TinyUNet forward
    unet = TinyUNet(out_channels=3, base_channels=32,
                    channel_mult=(1, 2, 2, 2), num_classes=3)
    xu = np.random.default_rng(1).standard_normal((2, 16, 16, 3)).astype(
        np.float32)
    tu = np.asarray([3, 500], np.int32)
    yu = np.asarray([1, 2], np.int32)
    pu = unet.init(jax.random.key(2), jnp.asarray(xu), jnp.asarray(tu),
                   jnp.asarray(yu))
    g["tiny_unet_x"] = xu
    g["tiny_unet_out"] = np.asarray(
        unet.apply(pu, jnp.asarray(xu), jnp.asarray(tu), jnp.asarray(yu)))

    # fixed-weight MMDiT forward
    cfg = MMDiTConfig(depth=2, pos_embed_max_size=8)
    mmdit = MMDiT(cfg)
    xm = np.random.default_rng(3).standard_normal((1, 8, 8, 16)).astype(
        np.float32)
    tm = np.asarray([500.0], np.float32)
    ym = np.random.default_rng(4).standard_normal((1, 2048)).astype(
        np.float32)
    cm = np.random.default_rng(5).standard_normal((1, 154, 4096)).astype(
        np.float32)
    pm = mmdit.init(jax.random.key(6), jnp.asarray(xm), jnp.asarray(tm),
                    jnp.asarray(ym), jnp.asarray(cm))
    g["mmdit_x"] = xm
    g["mmdit_out"] = np.asarray(mmdit.apply(
        pm, jnp.asarray(xm), jnp.asarray(tm), jnp.asarray(ym),
        jnp.asarray(cm)))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT} ({len(g)} arrays, "
          f"{os.path.getsize(OUT) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
