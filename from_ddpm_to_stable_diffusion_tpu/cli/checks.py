"""Per-stage shape checks — the reference's `01_check.py` UX as one CLI.

Runs random-tensor forward passes through each stage's models and prints
the shape trace (the reference's de-facto test idiom, SURVEY.md §4).

  python -m from_ddpm_to_stable_diffusion_tpu.cli.checks sd1|sd3|vae|vit|clip|tiny
"""

from __future__ import annotations

import argparse


def check_tiny():
    import jax
    import jax.numpy as jnp

    from ..models.tiny_unet import TinyUNet

    model = TinyUNet(base_channels=64, num_classes=3)
    x = jnp.zeros((2, 64, 64, 3))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.ones((2,), jnp.int32)
    params = model.init(jax.random.key(0), x, t, y)
    out = model.apply(params, x, t, y)
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"tiny UNet: in {x.shape} -> out {out.shape}  params {n:,}")
    assert out.shape == x.shape


def plot_schedule(out_path: str = "parameters.png",
                  beta_1: float = 0.0015, beta_T: float = 0.0195,
                  T: int = 1000):
    """√ᾱ_t / √(1−ᾱ_t) noise-schedule curves — the reference's
    visual_alpha() check (06_tiny_stable_diffusion/01_check.py:33-47)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops.schedules import ddpm_tables

    tables = ddpm_tables(beta_1, beta_T, T)
    plt.figure(figsize=(12, 8))
    plt.plot(tables.sqrt_alphas_bar, label="sqrt_alphas_bar")
    plt.plot(tables.sqrt_one_minus_alphas_bar,
             label="sqrt_one_minus_alphas_bar", color="orange")
    plt.title("DDPM Parameters")
    plt.legend()
    plt.xlabel("Timesteps")
    plt.ylabel("Value")
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close()
    print(f"schedule plot -> {out_path}")
    return out_path


def check_sd1():
    import jax
    import jax.numpy as jnp

    from ..models.sd1 import CLIPText, SD1UNet, VAEDecoder, VAEEncoder

    clip = CLIPText(num_layers=2)
    tokens = jnp.zeros((1, 77), jnp.int32)
    cp = clip.init(jax.random.key(0), tokens)
    print(f"CLIP text: {tokens.shape} -> {clip.apply(cp, tokens).shape}")

    unet = SD1UNet(model_channels=64)
    x = jnp.zeros((1, 32, 32, 4))
    ctx = jnp.zeros((1, 77, 768))
    t = jnp.zeros((1, 320))
    up = unet.init(jax.random.key(1), x, ctx, t)
    print(f"UNet: {x.shape} -> {unet.apply(up, x, ctx, t).shape}")

    enc, dec = VAEEncoder(), VAEDecoder()
    img = jnp.zeros((1, 64, 64, 3))
    noise = jnp.zeros((1, 8, 8, 4))
    ep = enc.init(jax.random.key(2), img, noise)
    z = enc.apply(ep, img, noise)
    dp = dec.init(jax.random.key(3), z)
    print(f"VAE: {img.shape} -> {z.shape} -> {dec.apply(dp, z).shape}")


def check_sd3():
    import jax
    import jax.numpy as jnp

    from ..models.mmdit import MMDiT, MMDiTConfig

    cfg = MMDiTConfig(depth=2, pos_embed_max_size=16)
    model = MMDiT(cfg)
    x = jnp.zeros((2, 16, 16, 16))
    t = jnp.asarray([500.0, 500.0])
    y = jnp.zeros((2, 2048))
    ctx = jnp.zeros((2, 154, 4096))
    params = model.init(jax.random.key(0), x, t, y, ctx)
    out = model.apply(params, x, t, y, ctx)
    print(f"MMDiT(depth=2): latent {x.shape}, ctx {ctx.shape}, "
          f"pooled {y.shape} -> {out.shape}")
    assert out.shape == x.shape


def check_vae():
    import jax
    import jax.numpy as jnp

    from ..models.vae import VanillaVAE, VQVAE

    v = VanillaVAE(image_size=64, latent_dim=32,
                   hidden_dims=(16, 32, 64, 64, 64))
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = v.init({"params": jax.random.key(0),
                    "latent": jax.random.key(1)}, x)
    recon, mu, log_var = v.apply(vars_, x, rngs={"latent": jax.random.key(2)})
    print(f"VanillaVAE: {x.shape} -> recon {recon.shape}, mu {mu.shape}")

    q = VQVAE(embedding_dim=4, num_embeddings=32, hidden_dims=(16, 32, 64))
    qp = q.init(jax.random.key(3), x)
    recon, vq_loss, idx = q.apply(qp, x)
    print(f"VQVAE: {x.shape} -> recon {recon.shape}, codes {idx.shape}")


def check_vit():
    import jax
    import jax.numpy as jnp

    from ..models.vit import ViT

    m = ViT(image_size=128, patch_size=32, num_classes=3, dim=512, depth=6,
            heads=8, mlp_dim=1024)
    x = jnp.zeros((2, 128, 128, 3))
    p = m.init(jax.random.key(0), x)
    n = sum(a.size for a in jax.tree_util.tree_leaves(p))
    print(f"ViT: {x.shape} -> {m.apply(p, x).shape}  params {n:,}")


def check_clip():
    import jax
    import jax.numpy as jnp

    from ..models.clip import CLIP
    from ..models.siglip import SiglipVisionConfig, SiglipVisionModel

    m = CLIP(embed_dim=64, image_resolution=64, vision_layers=2,
             vision_width=128, vision_patch_size=16, context_length=16,
             vocab_size=128, transformer_width=64, transformer_heads=4,
             transformer_layers=2)
    img = jnp.zeros((2, 64, 64, 3))
    txt = jnp.zeros((2, 16), jnp.int32)
    p = m.init(jax.random.key(0), img, txt)
    li, lt = m.apply(p, img, txt)
    print(f"CLIP: image {img.shape} + text {txt.shape} -> logits {li.shape}")

    sig = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=64, patch_size=16))
    sp = sig.init(jax.random.key(1), img)
    print(f"SigLIP vision: {img.shape} -> {sig.apply(sp, img).shape}")


def check_clip_pretrained(ckpt: str, image_path: str, vocab_dir: str,
                          prompts=None):
    """The reference's stage-05 check with real weights
    (05_clip/01_check.py:8-27): pretrained ViT-L/14 on an image, softmax
    probabilities over candidate captions."""
    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..io.tokenizer import CLIPTokenizer
    from ..io.weights_clip import import_openai_clip
    from ..models.clip import CLIP
    from ..ops.image import clip_preprocess

    prompts = prompts or ["a cat", "a dog", "a wild animal"]
    params, cfg = import_openai_clip(ckpt)
    model = CLIP(**cfg)
    tokenizer = CLIPTokenizer.from_files(
        os.path.join(vocab_dir, "vocab.json"),
        os.path.join(vocab_dir, "merges.txt"))
    image = jnp.asarray(clip_preprocess(Image.open(image_path),
                                        cfg["image_resolution"]))
    text = jnp.asarray(tokenizer.encode_batch(prompts), jnp.int32)
    text = text[:, :cfg["context_length"]]
    logits, _ = jax.jit(lambda p, i, t: model.apply({"params": p}, i, t))(
        jax.tree_util.tree_map(jnp.asarray, params), image, text)
    probs = jax.nn.softmax(logits, axis=-1)[0]
    for prompt, prob in zip(prompts, probs):
        print(f"  {prompt!r}: {float(prob):.4f}")
    return probs


def check_siglip_pretrained(ckpt: str, image_path: str):
    """Pretrained SigLIP vision tower on an image: loads the HF-layout
    checkpoint through io.weights_clip.import_siglip_vision and prints the
    patch-feature summary (the reference's SigLIP is vision-only,
    model_siglip.py:235 — no text head to score against)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..io.weights_clip import import_siglip_vision
    from ..models.siglip import SiglipVisionConfig, SiglipVisionModel

    params, cfg = import_siglip_vision(ckpt)
    model = SiglipVisionModel(SiglipVisionConfig(**cfg))
    img = Image.open(image_path).convert("RGB").resize(
        (cfg["image_size"], cfg["image_size"]))
    x = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    feats = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        jax.tree_util.tree_map(jnp.asarray, params), x)
    print(f"  SigLIP({cfg['num_hidden_layers']}L/{cfg['hidden_size']}d, "
          f"patch {cfg['patch_size']}): {x.shape} -> {feats.shape}  "
          f"mean {float(feats.mean()):+.4f}  std {float(feats.std()):.4f}")
    return feats


def check_weights(path: str):
    """Dump tensor names/shapes/dtypes of a checkpoint file — the
    reference's check_tensor() (01_.../01_check.py:100-108)."""
    from ..io.weights import load_safetensors_dict, load_torch_state_dict

    state = (load_safetensors_dict(path) if path.endswith(".safetensors")
             else load_torch_state_dict(path))
    for k in sorted(state):
        v = state[k]
        print(f"{k}: {tuple(v.shape)} {v.dtype}")
    print(f"{len(state)} tensors")


CHECKS = {"tiny": check_tiny, "sd1": check_sd1, "sd3": check_sd3,
          "vae": check_vae, "vit": check_vit, "clip": check_clip}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="checks")
    ap.add_argument("stage", choices=sorted(CHECKS) + ["all", "weights"])
    ap.add_argument("path", nargs="?", help="checkpoint path (weights mode)")
    ap.add_argument("--ckpt", help="pretrained OpenAI-CLIP checkpoint: "
                    "run the stage-05 real-weights check (clip stage only)")
    ap.add_argument("--siglip-ckpt",
                    help="pretrained HF SigLIP checkpoint (clip stage)")
    ap.add_argument("--image", help="image for the pretrained CLIP check")
    ap.add_argument("--vocab-dir", help="dir with vocab.json + merges.txt")
    ap.add_argument("--prompt", action="append",
                    help="candidate captions (repeatable)")
    ap.add_argument("--plot-schedule", metavar="OUT.png", nargs="?",
                    const="parameters.png",
                    help="tiny stage: plot the √ᾱ noise-schedule curves "
                    "(reference visual_alpha, 06_…/01_check.py:33)")
    args = ap.parse_args(argv)
    if args.stage == "tiny" and args.plot_schedule:
        plot_schedule(args.plot_schedule)
        return 0
    if args.stage == "weights":
        if not args.path:
            ap.error("weights mode needs a checkpoint path")
        check_weights(args.path)
        return 0
    if args.stage == "clip" and args.ckpt:
        if not (args.image and args.vocab_dir):
            ap.error("--ckpt needs --image and --vocab-dir")
        check_clip_pretrained(args.ckpt, args.image, args.vocab_dir,
                              args.prompt)
        return 0
    if args.stage == "clip" and args.siglip_ckpt:
        if not args.image:
            ap.error("--siglip-ckpt needs --image")
        check_siglip_pretrained(args.siglip_ckpt, args.image)
        return 0
    stages = sorted(CHECKS) if args.stage == "all" else [args.stage]
    for s in stages:
        print(f"--- {s} ---")
        CHECKS[s]()
    print("all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
