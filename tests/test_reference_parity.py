"""FULL-MODEL numerical parity against the reference's OWN torch code.

Unlike test_torch_parity.py (hand-written oracle blocks), these tests import
the actual reference modules from /root/reference, randomize their weights,
export ``state_dict()``, run it through our declarative importers, and assert
fp32 forward parity of the COMPLETE composed models:

- SD1: full 860M ``Diffusion`` UNet (01_.../diffusion.py:167-205), ``CLIP``
  text tower (clip.py:44-60), VAE ``Encoder``/``Decoder``
  (encoder.py:7-44, decoder.py:93-134).
- SD3: full ``MMDiT`` (02_.../mmdit.py:556-589), full ``T5`` stack
  (utils.py:484-536), ``CLIPTextModel`` tower (utils.py:165-185), and the
  16-ch ``SDVAE`` encoder/decoder (utils.py:623-752) — tiny configs for
  CPU speed plus the full-size SDVAE.

This is the strongest correctness evidence available without real
checkpoints: a transposed kernel, swapped skip-concat order, or a wrong
key mapping ANYWHERE in the composition fails these, and ``apply_rules``
(strict=True) additionally proves both-way key completeness against a real
reference state dict.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from from_ddpm_to_stable_diffusion_tpu.io import weights as W

pytestmark = pytest.mark.slow  # compile-heavy: full models

SD1_DIR = "/root/reference/01_stable_diffusion-1"
SD3_DIR = "/root/reference/02_stable_diffusion-3"


# --------------------------------------------------------------------------
# Reference-module loading
# --------------------------------------------------------------------------
def _sd1_pkg():
    if SD1_DIR not in sys.path:
        sys.path.insert(0, SD1_DIR)
    import stable_diffusion_pytorch as sdp  # noqa: PLC0415

    return sdp


def _sd3_modules():
    """Load the reference's top-level utils.py / mmdit.py under private
    names (mmdit.py does ``from utils import attention, Mlp``, so 'utils'
    must exist in sys.modules only while mmdit executes)."""
    import importlib.util

    if "sd3ref_mmdit" in sys.modules:
        return sys.modules["sd3ref_utils"], sys.modules["sd3ref_mmdit"]

    def load(modname, fname):
        spec = importlib.util.spec_from_file_location(
            modname, f"{SD3_DIR}/{fname}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod

    u = load("sd3ref_utils", "utils.py")
    had = "utils" in sys.modules
    prev = sys.modules.get("utils")
    sys.modules["utils"] = u
    try:
        m = load("sd3ref_mmdit", "mmdit.py")
    finally:
        if had:
            sys.modules["utils"] = prev
        else:
            del sys.modules["utils"]
    return u, m


# --------------------------------------------------------------------------
# Helpers
# --------------------------------------------------------------------------
def _randomize(module: torch.nn.Module, seed: int) -> None:
    """Replace every param AND buffer with seeded random values (default
    inits include zeros/identity — e.g. CLIP position_value, DiT adaLN —
    which would let mapping bugs pass unnoticed). Norm gains center at 1,
    matrices get fan-in-scaled gaussians so deep compositions stay O(1)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        tensors = list(module.state_dict().items())
        for name, v in tensors:
            if v.dtype not in (torch.float32, torch.float64, torch.float16,
                               torch.bfloat16):
                continue
            r = torch.randn(v.shape, generator=g, dtype=torch.float32)
            if "norm" in name.lower() and name.endswith("weight") \
                    and v.ndim == 1:
                v.copy_(1.0 + 0.1 * r)
            elif v.ndim >= 2:
                fan = max(1, v.numel() // v.shape[0])
                v.copy_(r * fan ** -0.5)
            else:
                v.copy_(0.02 * r)


def _state(module) -> dict:
    return {k: v.float().numpy() for k, v in module.state_dict().items()}


def _to_tree(state, rules, strict=True):
    return jax.tree_util.tree_map(
        jnp.asarray, W.apply_rules(state, rules, strict=strict))


def _assert_close(got, want, tol=2e-4, what=""):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    assert got.shape == want.shape, (what, got.shape, want.shape)
    scale = float(np.abs(want).max())
    assert scale > 1e-3, f"{what}: degenerate oracle output (max {scale})"
    err = float(np.abs(got - want).max()) / scale
    assert err <= tol, f"{what}: rel-to-peak err {err:.2e} > {tol:.0e}"


def _nchw(x):  # torch NCHW tensor -> NHWC numpy
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def _to_nchw(a):  # our NHWC jax array -> NCHW numpy
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


# --------------------------------------------------------------------------
# SD1 family (reference package stable_diffusion_pytorch)
# --------------------------------------------------------------------------
def test_reference_sd1_clip_full():
    sdp = _sd1_pkg()
    tm = sdp.CLIP().eval()
    _randomize(tm, 10)
    tokens = torch.randint(0, 49408, (2, 77),
                           generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tm(tokens).numpy()

    from from_ddpm_to_stable_diffusion_tpu.models.sd1 import CLIPText

    params = _to_tree(W.make_compatible(_state(tm)), W.sd1_clip_rules())
    got = CLIPText().apply({"params": params}, jnp.asarray(tokens.numpy()))
    _assert_close(got, want, what="sd1 CLIP (12L/768d, full)")


def test_reference_sd1_vae_encoder_full():
    sdp = _sd1_pkg()
    tm = sdp.Encoder().eval()
    _randomize(tm, 11)
    g = torch.Generator().manual_seed(2)
    x = torch.randn(1, 3, 64, 64, generator=g)
    noise = torch.randn(1, 4, 8, 8, generator=g)
    with torch.no_grad():
        want = tm(x, noise).numpy()

    from from_ddpm_to_stable_diffusion_tpu.models.sd1 import VAEEncoder

    params = _to_tree(W.make_compatible(_state(tm)),
                      W.sd1_vae_encoder_rules())
    got = VAEEncoder().apply({"params": params},
                             jnp.asarray(_nchw(x)), jnp.asarray(_nchw(noise)))
    _assert_close(_to_nchw(got), want, what="sd1 VAE encoder (full)")


def test_reference_sd1_vae_decoder_full():
    sdp = _sd1_pkg()
    tm = sdp.Decoder().eval()
    _randomize(tm, 12)
    z = torch.randn(1, 4, 8, 8, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        want = tm(z.clone()).numpy()  # reference mutates its input (/= scale)

    from from_ddpm_to_stable_diffusion_tpu.models.sd1 import VAEDecoder

    params = _to_tree(W.make_compatible(_state(tm)),
                      W.sd1_vae_decoder_rules())
    got = VAEDecoder().apply({"params": params}, jnp.asarray(_nchw(z)))
    _assert_close(_to_nchw(got), want, what="sd1 VAE decoder (full)")


def test_reference_sd1_unet_full_860m():
    """The big one: the complete 860M UNet (diffusion.py:110-205) with its
    12 encoder / bottleneck / 12 decoder stages, skip-concat order, time
    MLP and final layer — all through import_sd1_unet's mapping rules."""
    sdp = _sd1_pkg()
    tm = sdp.Diffusion().eval()
    _randomize(tm, 13)
    g = torch.Generator().manual_seed(4)
    latent = torch.randn(1, 4, 8, 8, generator=g)
    context = torch.randn(1, 77, 768, generator=g)
    time = torch.randn(1, 320, generator=g)
    with torch.no_grad():
        want = tm(latent, context, time).numpy()

    from from_ddpm_to_stable_diffusion_tpu.models.sd1 import SD1UNet

    state = W.make_compatible(_state(tm))
    del tm
    params = _to_tree(state, W.sd1_unet_rules())
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert n == 859_520_964  # param-count contract vs the reference
    got = SD1UNet().apply({"params": params}, jnp.asarray(_nchw(latent)),
                          jnp.asarray(context.numpy()),
                          jnp.asarray(time.numpy()))
    # 5e-4: fp32 conv-algorithm noise accumulated over the 25-block depth
    # (the rest of the family holds 2e-4; this model is 4× deeper). The
    # real regression this guards — e.g. the stride-2 SAME-vs-(1,1)
    # padding bug this test caught — shows up at rel err ~1e0.
    _assert_close(_to_nchw(got), want, tol=5e-4,
                  what="sd1 UNet (860M, full)")


# --------------------------------------------------------------------------
# SD3 family (reference 02_stable_diffusion-3/{mmdit,utils}.py)
# --------------------------------------------------------------------------
def test_reference_sd3_mmdit_full_tiny():
    """Complete MMDiT (mmdit.py:412-589): patchify + cropped pos embed +
    t/y embedders + context embedder + joint blocks (incl. the pre_only
    last context block) + final adaLN + unpatchify. depth=2 keeps it
    CPU-fast; every code path of the full model runs."""
    _, mm = _sd3_modules()
    depth, hidden = 2, 128
    with torch.no_grad():
        tm = mm.MMDiT(
            input_size=8, patch_size=2, in_channels=16, depth=depth,
            adm_in_channels=64,
            context_embedder_config={
                "target": "torch.nn.Linear",
                "params": {"in_features": 32, "out_features": hidden}},
            pos_embed_max_size=8, num_patches=64, qkv_bias=True,
            dtype=torch.float32).eval()
    _randomize(tm, 20)
    g = torch.Generator().manual_seed(5)
    x = torch.randn(2, 16, 8, 8, generator=g)
    t = torch.tensor([500.0, 3.0])
    y = torch.randn(2, 64, generator=g)
    ctx = torch.randn(2, 7, 32, generator=g)
    with torch.no_grad():
        want = tm(x, t, y=y, context=ctx).numpy()

    from from_ddpm_to_stable_diffusion_tpu.io.weights_sd3 import \
        sd3_mmdit_rules
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    params = _to_tree(_state(tm), sd3_mmdit_rules(depth=depth))
    cfg = MMDiTConfig(patch_size=2, in_channels=16, depth=depth,
                      adm_in_channels=64, context_dim=32,
                      pos_embed_max_size=8)
    got = MMDiT(cfg).apply({"params": params}, jnp.asarray(_nchw(x)),
                           jnp.asarray(t.numpy()), jnp.asarray(y.numpy()),
                           jnp.asarray(ctx.numpy()))
    _assert_close(_to_nchw(got), want, what="sd3 MMDiT (full, depth=2)")


def test_reference_sd3_t5_full_stack_tiny():
    """Complete T5 encoder stack (utils.py:498-536): shared layer-0 rel-pos
    bias threaded as past_bias, RMS layer norms, gated-gelu FF, unscaled
    logits (k pre-scaled by (d/h)^0.5 at utils.py:468 cancels SDPA's
    1/sqrt(d_h))."""
    u, _ = _sd3_modules()
    cfg_dict = {"num_layers": 3, "d_model": 64, "d_ff": 128,
                "num_heads": 4, "vocab_size": 100}
    with torch.no_grad():
        tm = u.T5(cfg_dict, dtype=torch.float32, device="cpu").eval()
    _randomize(tm, 21)
    tokens = torch.randint(0, 100, (2, 77),
                           generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        want, _ = tm(tokens)
        want = want.numpy()

    from from_ddpm_to_stable_diffusion_tpu.io.weights_sd3 import sd3_t5_rules
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        T5Config, T5Encoder)

    params = _to_tree(_state(tm), sd3_t5_rules(num_layers=3))
    cfg = T5Config(vocab_size=100, d_model=64, d_ff=128, num_layers=3,
                   num_heads=4)
    got = T5Encoder(cfg).apply({"params": params},
                               jnp.asarray(tokens.numpy()))
    _assert_close(got, want, what="sd3 T5 (full stack, 3L)")


def test_reference_sd3_clip_tower_tiny():
    """Complete SD3 CLIP text tower (utils.py:140-185): causal mask built
    at forward, hidden-layer tap (-2, no LN on the tap), argmax-EOS pooling
    and the text_projection — via fuse_hf_clip_qkv + hf_clip_text_rules."""
    u, _ = _sd3_modules()
    cfg_dict = {"num_hidden_layers": 3, "hidden_size": 64,
                "num_attention_heads": 4, "intermediate_size": 256,
                "hidden_act": "quick_gelu"}
    with torch.no_grad():
        tm = u.CLIPTextModel(cfg_dict, dtype=torch.float32,
                             device="cpu").eval()
    _randomize(tm, 22)
    tokens = torch.randint(0, 49408, (2, 77),
                           generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        want_last, want_tap, pooled = tm.text_model(
            tokens, intermediate_output=-2,
            final_layer_norm_intermediate=False)
        want_pooled = tm.text_projection(pooled).numpy()

    from from_ddpm_to_stable_diffusion_tpu.io.weights_sd3 import (
        fuse_hf_clip_qkv, hf_clip_text_rules)
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        CLIPTextConfig, CLIPTextModel)

    # state dict uses SDClipModel's checkpoint layout: text_model.* paths
    state = {k.replace("text_model.", "text_model.", 1): v
             for k, v in _state(tm).items()}
    fuse_hf_clip_qkv(state, 3)
    params = _to_tree(state, hf_clip_text_rules(3))
    cfg = CLIPTextConfig(hidden_size=64, num_layers=3, num_heads=4,
                         hidden_act="quick_gelu")
    last, tap, pooled = CLIPTextModel(
        cfg, intermediate_output=-2, ln_intermediate=False).apply(
        {"params": params}, jnp.asarray(tokens.numpy()))
    _assert_close(last, want_last.numpy(), what="sd3 CLIP tower last")
    _assert_close(tap, want_tap.numpy(), what="sd3 CLIP tower tap")
    _assert_close(pooled, want_pooled, what="sd3 CLIP tower pooled")


def test_reference_sd3_vae_tiny():
    """SD3 VAE encoder+decoder (utils.py:623-733) at a reduced config —
    same block structure (asym-pad downsample, mid attn with 1×1-conv
    q/k/v, num_res_blocks+1 up blocks), smaller channels."""
    u, _ = _sd3_modules()
    from from_ddpm_to_stable_diffusion_tpu.io.weights_sd3 import (
        fuse_sd3_vae_attn, sd3_vae_decoder_rules, sd3_vae_encoder_rules)
    from from_ddpm_to_stable_diffusion_tpu.models.sd3_vae import (
        SD3VAEDecoder, SD3VAEEncoder)

    with torch.no_grad():
        te = u.VAEEncoder(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4).eval()
        td = u.VAEDecoder(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4).eval()
    _randomize(te, 23)
    _randomize(td, 24)
    g = torch.Generator().manual_seed(8)
    x = torch.randn(1, 3, 16, 16, generator=g)
    z = torch.randn(1, 4, 8, 8, generator=g)
    with torch.no_grad():
        want_moments = te(x).numpy()
        want_img = td(z).numpy()

    es = _state(te)
    fuse_sd3_vae_attn(es, "mid.attn_1")
    ep = _to_tree(es, sd3_vae_encoder_rules(ch_mult=(1, 2),
                                            num_res_blocks=1))
    got = SD3VAEEncoder(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4).apply({"params": ep},
                                            jnp.asarray(_nchw(x)))
    _assert_close(_to_nchw(got), want_moments, what="sd3 VAE encoder tiny")

    ds = _state(td)
    fuse_sd3_vae_attn(ds, "mid.attn_1")
    dp = _to_tree(ds, sd3_vae_decoder_rules(ch_mult=(1, 2),
                                            num_res_blocks=1))
    got = SD3VAEDecoder(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4).apply({"params": dp},
                                            jnp.asarray(_nchw(z)))
    _assert_close(_to_nchw(got), want_img, what="sd3 VAE decoder tiny")


def test_reference_sd3_sdvae_full():
    """The full-size 16-ch SDVAE (utils.py:736-752, ch=128, mult 1/2/4/4)
    through the same prefix-strip + fuse path import_sd3_checkpoint uses."""
    u, _ = _sd3_modules()
    with torch.no_grad():
        tm = u.SDVAE().eval()
    _randomize(tm, 25)
    g = torch.Generator().manual_seed(9)
    x = torch.randn(1, 3, 64, 64, generator=g)
    z = torch.randn(1, 16, 8, 8, generator=g)
    with torch.no_grad():
        # bypass the @autocast('cuda') wrappers: call the towers directly
        want_moments = tm.encoder(x).numpy()
        want_img = tm.decoder(z).numpy()

    from from_ddpm_to_stable_diffusion_tpu.io.weights_sd3 import (
        fuse_sd3_vae_attn, sd3_vae_decoder_rules, sd3_vae_encoder_rules)
    from from_ddpm_to_stable_diffusion_tpu.models.sd3_vae import (
        SD3VAEDecoder, SD3VAEEncoder)

    full = _state(tm)
    enc = {k[len("encoder."):]: v for k, v in full.items()
           if k.startswith("encoder.")}
    dec = {k[len("decoder."):]: v for k, v in full.items()
           if k.startswith("decoder.")}
    fuse_sd3_vae_attn(enc, "mid.attn_1")
    fuse_sd3_vae_attn(dec, "mid.attn_1")
    ep = _to_tree(enc, sd3_vae_encoder_rules())
    dp = _to_tree(dec, sd3_vae_decoder_rules())
    got = SD3VAEEncoder().apply({"params": ep}, jnp.asarray(_nchw(x)))
    _assert_close(_to_nchw(got), want_moments, what="SDVAE encoder full")
    got = SD3VAEDecoder().apply({"params": dp}, jnp.asarray(_nchw(z)))
    _assert_close(_to_nchw(got), want_img, what="SDVAE decoder full")
