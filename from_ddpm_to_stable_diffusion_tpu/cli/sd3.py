"""Stage-02 CLI: SD3 text→image generation.

Mirrors the 02_stable_diffusion-3/01_check.py demo op point (1024×1024,
50 steps, CFG 5, shift 3.0, seed 1) and sd3_infer.py's prompt-in image-out
surface. With --ckpt the model groups load from safetensors (MMDiT config
shape-sniffed, ref sd3_infer.py:85-105); without, a scaled-down
random-weight bundle runs a smoke test. Tokenizers: --vocab/--merges for
the CLIP pair, --spm for the T5 SentencePiece model; without files the
prompt falls back to deterministic placeholder ids (plumbing smoke only).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sd3")
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--prompt", required=True)
    g.add_argument("--neg-prompt", default="")
    g.add_argument("--prompt-weighting", action="store_true",
                   help="honor the (text:w) attention syntax on the CLIP "
                        "streams (beyond-reference; needs --vocab/--merges)")
    g.add_argument("--width", type=int, default=1024)
    g.add_argument("--height", type=int, default=1024)
    g.add_argument("--steps", type=int, default=50)
    g.add_argument("--sampler", choices=("euler", "heun"), default="euler",
                   help="heun: 2nd-order flow sampler — ~half the steps "
                        "at equal ODE accuracy (2 model calls/step)")
    g.add_argument("--cfg-scale", type=float, default=5.0)
    g.add_argument("--shift", type=float, default=3.0)
    g.add_argument("--seed", type=int, default=1)
    g.add_argument("--ckpt", default=None, help="sd3 .safetensors path")
    g.add_argument("--clip-l", default=None,
                   help="CLIP-L text encoder .safetensors (optional when "
                        "the main ckpt embeds text encoders)")
    g.add_argument("--clip-g", default=None,
                   help="CLIP-G text encoder .safetensors")
    g.add_argument("--t5", default=None, help="T5-XXL .safetensors")
    g.add_argument("--vocab", default=None, help="CLIP vocab.json")
    g.add_argument("--merges", default=None, help="CLIP merges.txt")
    g.add_argument("--spm", default=None,
                   help="T5 SentencePiece model file (spiece.model)")
    g.add_argument("--int8", action="store_true",
                   help="W8A8 int8 MMDiT+T5 projections: ~1.09x denoise "
                        "step and halved hot-weight HBM — the full "
                        "SD3-medium stack (incl. T5-XXL) stays RESIDENT "
                        "on one 16GB chip, no per-prompt phase offload "
                        "(docs/SD3_16GB.md)")
    g.add_argument("--offload-text-encoders", action="store_true",
                   help="free CLIP/T5 HBM after conditioning (16GB plan)")
    g.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel serving over N devices (shards "
                        "MMDiT/CLIP/T5 kernels on the model mesh axis)")
    g.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel MMDiT joint attention over N "
                        "devices (ring KV rotation / Ulysses all-to-all; "
                        "for >16k-token joint sequences — see "
                        "docs/RING_SCALING.md; mutually exclusive w/ --tp)")
    g.add_argument("--sp-impl", choices=("ring", "ulysses"),
                   default="ring")
    g.add_argument("--init-image", default=None,
                   help="img2img: init image path (resized to "
                        "width×height, VAE-encoded, partially denoised — "
                        "ref sd3_infer.py:349-362)")
    g.add_argument("--strength", type=float, default=0.8,
                   help="img2img denoise strength in (0,1]")
    g.add_argument("--save-trajectory", action="store_true",
                   help="also save a grid of per-step latent RGB previews")
    g.add_argument("--out", default="sd3_out.png")

    t = sub.add_parser(
        "train", help="rectified-flow-train an MMDiT (beyond-reference: "
        "the reference ships SD3 inference-only). Synthetic latent/"
        "conditioning data — demonstrates the training path end to end; "
        "point the same MMDiTTrainer at VAE latents + encoder outputs for "
        "real data.")
    t.add_argument("--depth", type=int, default=2)
    t.add_argument("--img-size", type=int, default=16,
                   help="LATENT spatial size")
    t.add_argument("--context-len", type=int, default=8)
    t.add_argument("--context-dim", type=int, default=64)
    t.add_argument("--adm", type=int, default=64)
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--steps", type=int, default=20)
    t.add_argument("--dtype", choices=("fp32", "bf16"), default="bf16")
    t.add_argument("--fsdp", action="store_true",
                   help="store the train state ZeRO-sharded over data")
    t.add_argument("--tp", type=int, default=1,
                   help="hybrid data×model mesh (heads must divide)")
    t.add_argument("--lora-rank", type=int, default=None,
                   help="freeze the base, train rank-r adapters only")
    t.add_argument("--moe-experts", type=int, default=None,
                   help="sparse MMDiT: Switch-MoE block MLPs with E "
                        "experts (shard over an 'expert' mesh axis on "
                        "multi-chip)")
    t.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches averaged per optimizer update")
    t.add_argument("--seed", type=int, default=0)

    args = ap.parse_args(argv)

    if args.cmd == "train":
        return _train(args)

    import jax
    import numpy as np
    from PIL import Image

    from ..pipelines.sd3 import SD3Inferencer, SD3Models

    if args.ckpt:
        print(f"[sd3] loading checkpoints: {args.ckpt}", file=sys.stderr)
        models = SD3Models.from_checkpoints(
            args.ckpt, clip_l_path=args.clip_l, clip_g_path=args.clip_g,
            t5_path=args.t5)
    else:
        print("[sd3] no --ckpt: scaled-down random weights (smoke-test "
              "mode)", file=sys.stderr)
        models = SD3Models.initialize(jax.random.key(0), depth=4,
                                      pos_embed_max_size=96, with_t5=False)
    if args.int8:
        print("[sd3] quantizing MMDiT/T5 projections to int8 (W8A8)",
              file=sys.stderr)
        models.quantize_int8()

    tokenizer = None
    if args.vocab and args.merges:
        from ..io.spm_tokenizer import SD3Tokenizer, T5XXLTokenizer
        from ..io.tokenizer import CLIPTokenizer

        clip_tok = CLIPTokenizer.from_files(args.vocab, args.merges)
        if args.spm:
            t5_tok = T5XXLTokenizer.from_file(args.spm)
        else:
            # no spiece.model: T5 sees only the empty-prompt tokens
            from ..io.spm_tokenizer import (UNKNOWN, CONTROL,
                                            SentencePieceUnigram)

            t5_tok = T5XXLTokenizer(SentencePieceUnigram(
                [("<pad>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
                 ("<unk>", 0.0, UNKNOWN)]))
        tokenizer = SD3Tokenizer(clip_tok, t5_tok)

    mesh = None
    if args.tp > 1 and args.sp > 1:
        ap.error("--tp and --sp are mutually exclusive")
    if args.tp > 1:
        from ..parallel import build_mesh

        mesh = build_mesh({"model": args.tp}, jax.devices()[:args.tp])
    if args.sp > 1:
        import dataclasses as _dc

        from ..parallel import build_mesh

        seq_mesh = build_mesh({"seq": args.sp}, jax.devices()[:args.sp])
        from ..models.mmdit import MMDiT

        models.mmdit = MMDiT(
            _dc.replace(models.mmdit.config, attention_impl=args.sp_impl),
            dtype=models.mmdit.dtype, mesh=seq_mesh)
    inf = SD3Inferencer(models, shift=args.shift, tokenizer=tokenizer,
                        mesh=mesh)
    kwargs = dict(width=args.width, height=args.height, steps=args.steps,
                  cfg_scale=args.cfg_scale, seed=args.seed,
                  offload_text_encoders=args.offload_text_encoders,
                  keep_trajectory=args.save_trajectory,
                  sampler=args.sampler)
    if args.init_image:
        raw = np.asarray(Image.open(args.init_image).convert("RGB").resize(
            (args.width, args.height)), np.float32)
        kwargs["init_image"] = (raw / 255.0 * 2.0 - 1.0)[None]
        kwargs["denoise_strength"] = args.strength

    if tokenizer is not None:
        out = inf.gen_image_text(args.prompt, args.neg_prompt,
                                 prompt_weighting=args.prompt_weighting,
                                 **kwargs)
    else:
        print("[sd3] no tokenizer files: deterministic placeholder token "
              "ids (smoke-test plumbing only)", file=sys.stderr)
        rng = np.random.default_rng(abs(hash(args.prompt)) % 2**32)
        clip_tokens = rng.integers(0, 49408, (1, 77)).astype(np.int32)
        neg_tokens = np.zeros((1, 77), np.int32)
        out = inf.gen_image(clip_tokens, neg_clip_tokens=neg_tokens,
                            **kwargs)

    if args.save_trajectory:
        img, previews = out
        cols = min(len(previews), 10)
        rows = -(-len(previews) // cols)
        h, w = previews.shape[1:3]
        grid = np.zeros((rows * h, cols * w, 3), np.uint8)
        for i, p in enumerate(previews):
            r, c = divmod(i, cols)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = p
        traj_path = args.out.rsplit(".", 1)[0] + "_trajectory.png"
        Image.fromarray(grid).save(traj_path)
        print(f"wrote {traj_path}")
    else:
        img = out
    Image.fromarray(np.asarray(img[0])).save(args.out)
    print(f"wrote {args.out}")
    return 0


def _train(args):
    import numpy as np

    import jax

    from ..models.mmdit import MMDiTConfig
    from ..parallel import build_mesh
    from ..pipelines.mmdit_trainer import MMDiTTrainer
    from ..utils.config import FlowTrainConfig

    mesh = None
    if args.tp > 1:
        n = len(jax.devices())
        mesh = build_mesh({"data": max(n // args.tp, 1), "model": args.tp},
                          jax.devices()[:max(n // args.tp, 1) * args.tp])
    mcfg = MMDiTConfig(patch_size=2, in_channels=16, depth=args.depth,
                       adm_in_channels=args.adm,
                       context_dim=args.context_dim,
                       pos_embed_max_size=max(args.img_size // 2, 8),
                       moe_experts=args.moe_experts)
    cfg = FlowTrainConfig(epoch=2, batch_size=args.batch_size,
                          img_size=args.img_size,
                          context_len=args.context_len, warmup_epochs=1,
                          dtype=args.dtype, seed=args.seed,
                          grad_accum=args.grad_accum)
    trainer = MMDiTTrainer(mcfg, cfg, mesh=mesh, fsdp=args.fsdp,
                           lora_rank=args.lora_rank)
    state = trainer.create_state(
        steps_per_epoch=max(args.steps // cfg.epoch, 1))
    kind = f"LoRA r={args.lora_rank} adapters" if args.lora_rank else "params"
    print(f"[sd3 train] MMDiT depth={args.depth} "
          f"({trainer.num_params(state):,} trainable {kind}); "
          f"mesh={dict(trainer.mesh.shape)} fsdp={args.fsdp}",
          file=sys.stderr)

    r = np.random.default_rng(args.seed)
    latents = r.normal(size=(args.batch_size, args.img_size, args.img_size,
                             16)).astype(np.float32)
    context = r.normal(size=(args.batch_size, args.context_len,
                             args.context_dim)).astype(np.float32)
    y = r.normal(size=(args.batch_size, args.adm)).astype(np.float32)
    rng = jax.random.key(args.seed + 1)
    losses = []
    for i in range(args.steps):
        state, loss = trainer.train_step(state, latents, context, y, rng)
        losses.append(float(loss))
        if i % 5 == 0 or i == args.steps - 1:
            print(f"[sd3 train] step {i}: loss {losses[-1]:.4f}",
                  file=sys.stderr)
    out = trainer.sample(state, context[:2], y[:2], steps=4)
    assert np.isfinite(np.asarray(out)).all()
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f} over {args.steps} "
          f"steps; sampled latents {tuple(out.shape)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
