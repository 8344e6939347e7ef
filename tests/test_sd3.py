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

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


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


def _tiny_sd3_models(with_t5=True):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Models

    return SD3Models.initialize(
        jax.random.key(0), dtype="fp32", depth=2, pos_embed_max_size=16,
        with_t5=with_t5,
        clip_l_cfg=CLIPTextConfig(vocab_size=64, hidden_size=768,
                                  num_layers=2, num_heads=4),
        clip_g_cfg=CLIPTextConfig(vocab_size=64, hidden_size=1280,
                                  num_layers=2, num_heads=4,
                                  hidden_act="gelu"),
        t5_config=T5Config(vocab_size=64, d_model=4096, d_ff=64,
                           num_layers=1, num_heads=4))


def _tiny_sd3_tokenizer(clip_vocab_size=64):
    """Tokenizer trio whose ids stay inside the tiny test vocabularies."""
    from from_ddpm_to_stable_diffusion_tpu.io.spm_tokenizer import (
        CONTROL, NORMAL, UNKNOWN, SD3Tokenizer, SentencePieceUnigram,
        T5XXLTokenizer)
    from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import CLIPTokenizer

    # CLIP side: single-byte vocab, ids < 64 by construction
    table_chars = "abcdefghijklmnopqrstuvwxyz "
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for ch in table_chars:
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault(ch + "</w>", len(vocab))
    clip = CLIPTokenizer(vocab, merges={})
    spm = SentencePieceUnigram([
        ("<pad>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
        ("<unk>", 0.0, UNKNOWN), ("▁cat", -1.0, NORMAL),
        ("▁a", -1.0, NORMAL), ("▁", -2.0, NORMAL)])
    return SD3Tokenizer(clip, T5XXLTokenizer(spm))


def test_sd3_pipeline_end_to_end_tiny():
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    inf = SD3Inferencer(_tiny_sd3_models(), shift=3.0)
    tokens = np.zeros((1, 77), np.int32)
    img = inf.gen_image(tokens, t5_tokens=tokens, width=128, height=128,
                        steps=2, cfg_scale=5.0, seed=1)
    assert img.shape == (1, 128, 128, 3)
    assert img.dtype == np.uint8


def test_sd3_prompt_to_image_text_path():
    """Prompt strings in, PNG-ready uint8 out (ref sd3_infer.py:383-405)."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    inf = SD3Inferencer(_tiny_sd3_models(), shift=3.0,
                        tokenizer=_tiny_sd3_tokenizer())
    img = inf.gen_image_text("a cat", width=64, height=64, steps=2, seed=1)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8
    # determinism: same prompt+seed → same image
    img2 = inf.gen_image_text("a cat", width=64, height=64, steps=2, seed=1)
    np.testing.assert_array_equal(img, img2)


def test_sd3_batched_prompts_per_sample_seeds():
    """Serving contract: gen_images_text batches N prompts into ONE
    text-encode + denoise, and a request's image is identical whether it
    rides alone or in a batch (per-sample noise keys)."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    inf = SD3Inferencer(_tiny_sd3_models(), shift=3.0,
                        tokenizer=_tiny_sd3_tokenizer())
    solo = inf.gen_images_text(["a cat"], per_sample_seeds=[5],
                               width=64, height=64, steps=2)
    pair = inf.gen_images_text(["a cat", "cat a"], per_sample_seeds=[5, 9],
                               width=64, height=64, steps=2)
    assert pair.shape == (2, 64, 64, 3) and pair.dtype == np.uint8
    # batch-1 vs batch-2 are different XLA programs: allow the uint8
    # quantization-boundary pixel (same tolerance as the SD1 serving test)
    np.testing.assert_allclose(solo[0].astype(np.int16),
                               pair[0].astype(np.int16), atol=1)
    assert not np.array_equal(pair[0], pair[1])


def test_sd3_empty_negative_goes_through_t5():
    """The empty negative prompt must be ENCODED by T5 (non-zero
    embeddings), not zero-filled (ref sd3_infer.py:306-309)."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    inf = SD3Inferencer(_tiny_sd3_models(), shift=3.0)
    tokens = np.zeros((1, 77), np.int32)
    ctx, _ = inf.get_cond(tokens, t5_tokens=None)  # default: empty prompt
    t5_slice = np.asarray(ctx)[:, 77:, :]
    assert np.abs(t5_slice).max() > 0


def test_sd3_offload_frees_text_encoders():
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    models = _tiny_sd3_models()
    inf = SD3Inferencer(models, shift=3.0)
    tokens = np.zeros((1, 77), np.int32)
    img = inf.gen_image(tokens, t5_tokens=tokens, width=64, height=64,
                        steps=2, seed=1, offload_text_encoders=True)
    assert img.shape == (1, 64, 64, 3)
    for group in ("clip_l", "clip_g", "t5"):
        assert group not in models.params  # HBM reclaimed
    assert "mmdit" in models.params  # denoise weights stay resident


def test_sd3_from_checkpoints_file_end_to_end(tmp_path):
    """The CLI --ckpt path: write a synthetic tiny sd3 .safetensors (MMDiT
    + both VAE halves under the reference key layout), load it through
    SD3Models.from_checkpoints (config shape-sniffed), denoise + decode."""
    from safetensors.numpy import save_file

    from from_ddpm_to_stable_diffusion_tpu.io import weights_sd3 as W3
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)
    from from_ddpm_to_stable_diffusion_tpu.models.sd3_vae import (
        SD3VAEDecoder, SD3VAEEncoder)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import (
        SD3Inferencer, SD3Models)
    from tests.test_weights import _invert, _tree_paths

    def torch_state(model, init_args, rules, prefix):
        params = model.init(jax.random.key(0), *init_args)["params"]
        shapes = _tree_paths(jax.tree_util.tree_map(np.asarray, params))
        return {prefix + k: np.asarray(v, np.float32)
                for k, v in _invert(rules, shapes).items()}

    cfg = MMDiTConfig(depth=2, pos_embed_max_size=16)
    state = {}
    state.update(torch_state(
        MMDiT(cfg),
        (jnp.zeros((1, 16, 16, 16)), jnp.zeros((1,)), jnp.zeros((1, 2048)),
         jnp.zeros((1, 154, 4096))),
        W3.sd3_mmdit_rules(depth=2, qk_norm=False),
        "model.diffusion_model."))
    state.update(torch_state(
        SD3VAEEncoder(), (jnp.zeros((1, 32, 32, 3)),),
        W3.sd3_vae_encoder_rules(), "first_stage_model.encoder."))
    state.update(torch_state(
        SD3VAEDecoder(), (jnp.zeros((1, 4, 4, 16)),),
        W3.sd3_vae_decoder_rules(), "first_stage_model.decoder."))
    path = str(tmp_path / "sd3_tiny.safetensors")
    save_file(state, path)

    models = SD3Models.from_checkpoints(path, dtype="fp32")
    assert models.mmdit.config.depth == 2  # sniffed from tensor shapes
    inf = SD3Inferencer(models, shift=3.0)
    ctx = jnp.zeros((1, 154, 4096))
    pooled = jnp.zeros((1, 2048))
    latent = inf.denoise(inf.get_empty_latent(64, 64), ctx, pooled, ctx,
                         pooled, steps=2, seed=1)
    img = inf.vae_decode(latent)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8


def test_sd3_keep_trajectory_previews():
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    inf = SD3Inferencer(_tiny_sd3_models(with_t5=False), shift=3.0)
    tokens = np.zeros((1, 77), np.int32)
    img, previews = inf.gen_image(tokens, width=64, height=64, steps=3,
                                  seed=1, keep_trajectory=True)
    assert img.shape == (1, 64, 64, 3)
    assert previews.shape == (3, 8, 8, 3)  # one RGB preview per step
    assert previews.dtype == np.uint8


def test_sd3_inferencer_tp_mesh_matches_single_device():
    """TP-sharded SD3 serving (mesh=) must equal the unsharded pipeline."""
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    tokens = np.zeros((1, 77), np.int32)
    ref = SD3Inferencer(_tiny_sd3_models(), shift=3.0).gen_image(
        tokens, t5_tokens=tokens, width=64, height=64, steps=2, seed=3)

    mesh = build_mesh({"model": 2}, jax.devices()[:2])
    got = SD3Inferencer(_tiny_sd3_models(), shift=3.0, mesh=mesh).gen_image(
        tokens, t5_tokens=tokens, width=64, height=64, steps=2, seed=3)

    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"


def test_sd3_pipeline_heun_sampler():
    """sampler='heun' runs the whole prompt→image path (2 model calls per
    step except the σ→0 final step)."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    inf = SD3Inferencer(_tiny_sd3_models(), shift=3.0)
    tokens = np.zeros((1, 77), np.int32)
    img = inf.gen_image(tokens, t5_tokens=tokens, width=128, height=128,
                        steps=2, cfg_scale=5.0, seed=1, sampler="heun")
    assert img.shape == (1, 128, 128, 3)
    assert np.isfinite(img.astype(np.float32)).all()


def test_sd3_prompt_weighting():
    """(text:w) syntax on the SD3 trio: stripped ids match the plain
    encode, weights land on the right tokens, weight-1.0 round-trips the
    conditioning exactly, and a real weight changes it."""
    tok = _tiny_sd3_tokenizer()
    streams, w = tok.encode_with_weights("a (cat:1.5)")
    plain = tok.encode("a cat")
    assert streams["l"] == plain["l"]
    assert streams["g"] == plain["g"]
    assert streams["t5xxl"] == plain["t5xxl"]
    assert max(w) == 1.5 and min(w) == 1.0
    # weighted positions sit between BOS and EOS
    n_weighted = sum(1 for x in w if x == 1.5)
    assert 0 < n_weighted < 10

    inf = SD3Inferencer_tiny()
    arr = lambda x: np.asarray([x], np.int32)
    base_ctx, base_pool = inf.get_cond(arr(plain["l"]),
                                       arr(plain["t5xxl"]),
                                       clip_g_tokens=arr(plain["g"]))
    ones_ctx, _ = inf.get_cond(arr(plain["l"]), arr(plain["t5xxl"]),
                               clip_g_tokens=arr(plain["g"]),
                               clip_weights=np.ones((1, 77), np.float32))
    np.testing.assert_allclose(np.asarray(ones_ctx), np.asarray(base_ctx),
                               atol=1e-6)
    w_ctx, _ = inf.get_cond(arr(streams["l"]), arr(streams["t5xxl"]),
                            clip_g_tokens=arr(streams["g"]),
                            clip_weights=np.asarray([w], np.float32))
    # CLIP rows (first 77) change; T5 rows (last 77) don't
    assert float(np.abs(np.asarray(w_ctx[:, :77])
                        - np.asarray(base_ctx[:, :77])).max()) > 1e-4
    np.testing.assert_allclose(np.asarray(w_ctx[:, 77:]),
                               np.asarray(base_ctx[:, 77:]), atol=1e-6)


def SD3Inferencer_tiny():
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import SD3Inferencer

    return SD3Inferencer(_tiny_sd3_models(), shift=3.0,
                         tokenizer=_tiny_sd3_tokenizer())


def test_sd3_gen_image_text_prompt_weighting_end_to_end():
    inf = SD3Inferencer_tiny()
    img = inf.gen_image_text("a (cat:1.4)", prompt_weighting=True,
                             width=128, height=128, steps=2, seed=1)
    assert img.shape == (1, 128, 128, 3)


def test_sd3_executables_cached_across_calls():
    """Serving contract: repeated same-shape calls reuse ONE compiled
    executable per stage (encode / denoise scan / decode) — no per-request
    retrace (minutes-scale on the real chip's remote-compile tunnel)."""
    inf = SD3Inferencer_tiny()
    tokens = np.zeros((1, 77), np.int32)
    img1 = inf.gen_image(tokens, t5_tokens=tokens, width=128, height=128,
                         steps=2, seed=1)
    n_enc = len(inf._enc_cache)
    n_den = len(inf._denoise_cache)
    n_dec = len(inf._decode_cache)
    img2 = inf.gen_image(tokens, t5_tokens=tokens, width=128, height=128,
                         steps=2, seed=2)
    assert (len(inf._enc_cache), len(inf._denoise_cache),
            len(inf._decode_cache)) == (n_enc, n_den, n_dec)
    assert n_enc == 1 and n_den == 1 and n_dec == 1
    assert img1.shape == img2.shape
    assert not np.array_equal(img1, img2)  # different seeds


def test_qk_norm_logit_bound_gates_bounded_softmax():
    """Loaders certify the bounded-softmax fast path against the LOADED
    QKNorm gains (ADVICE r4): ones-init gains are safe; a pathological
    checkpoint with huge gains must exceed the budget."""
    import numpy as np

    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (
        BOUNDED_LOGIT_BUDGET, qk_norm_logit_bound)

    d = 64
    safe = {"joint_block0": {"x_block": {
        "ln_q": {"scale": np.ones((d,), np.float32)},
        "ln_k": {"scale": np.ones((d,), np.float32)}}}}
    # |logit| <= sqrt(d)·1·1 = 8 for unit gains
    b = qk_norm_logit_bound(safe, d, "rms")
    assert abs(b - d ** 0.5) < 1e-6 and b < BOUNDED_LOGIT_BUDGET

    hot = {"blk": {
        "ln_q": {"scale": np.full((d,), 4.0, np.float32)},
        "ln_k": {"scale": np.full((d,), 4.0, np.float32)}}}
    assert qk_norm_logit_bound(hot, d, "rms") >= BOUNDED_LOGIT_BUDGET

    # 'ln' adds the bias l2 term
    ln = {"blk": {
        "ln_q": {"scale": np.ones((d,), np.float32),
                 "bias": np.full((d,), 2.0, np.float32)},
        "ln_k": {"scale": np.ones((d,), np.float32),
                 "bias": np.zeros((d,), np.float32)}}}
    expect = (d ** 0.5 + 2.0 * d ** 0.5) * d ** 0.5 / d ** 0.5
    assert abs(qk_norm_logit_bound(ln, d, "ln") - expect) < 1e-5
