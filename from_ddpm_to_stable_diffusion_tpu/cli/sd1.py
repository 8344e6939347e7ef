"""Stage-01 CLI: SD1 text→image / image→image generation.

Mirrors the 01_check.py demo surface with the pipeline.generate defaults
(512×512, 50 steps, CFG 7.5, k_lms).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sd1")
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--prompt", action="append", required=True,
                   help="repeatable; one image per prompt")
    g.add_argument("--uncond-prompt", action="append", default=None)
    g.add_argument("--input-image", action="append", default=None)
    g.add_argument("--strength", type=float, default=0.8)
    g.add_argument("--cfg-scale", type=float, default=7.5)
    g.add_argument("--no-cfg", action="store_true")
    g.add_argument("--height", type=int, default=512)
    g.add_argument("--width", type=int, default=512)
    g.add_argument("--sampler", default="k_lms",
                   choices=["k_lms", "k_euler", "k_euler_ancestral", "dpmpp_2m"])
    g.add_argument("--steps", type=int, default=50)
    g.add_argument("--seed", type=int, default=None)
    g.add_argument("--prompt-weighting", action="store_true",
                   help="enable (text:1.3) attention-weight syntax")
    g.add_argument("--ckpt-dir", default=None,
                   help="dir with clip.pt/diffusion.pt/encoder.pt/decoder.pt"
                        " + vocab.json/merges.txt (reference layout)")
    g.add_argument("--dtype", default="bf16")
    g.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel serving over N devices (shards "
                        "attention/GEGLU kernels on the model mesh axis)")
    g.add_argument("--out", default="sd1_{i}.png")
    args = ap.parse_args(argv)

    import os

    import jax
    import numpy as np
    from PIL import Image

    from ..pipelines.sd1 import SD1Models, generate

    tokenizer = None
    if args.ckpt_dir:
        from ..io.tokenizer import CLIPTokenizer
        from ..io.weights import (import_sd1_clip, import_sd1_unet,
                                  import_sd1_vae_decoder,
                                  import_sd1_vae_encoder)
        from ..models.sd1 import CLIPText, SD1UNet, VAEDecoder, VAEEncoder
        from ..utils.dtypes import POLICIES

        dt = POLICIES[args.dtype].compute_dtype
        d = args.ckpt_dir
        models = SD1Models(
            clip=CLIPText(dtype=dt), unet=SD1UNet(dtype=dt),
            encoder=VAEEncoder(dtype=dt), decoder=VAEDecoder(dtype=dt),
            params={
                "clip": import_sd1_clip(os.path.join(d, "ckpt", "clip.pt")),
                "unet": import_sd1_unet(os.path.join(d, "ckpt", "diffusion.pt")),
                "encoder": import_sd1_vae_encoder(
                    os.path.join(d, "ckpt", "encoder.pt")),
                "decoder": import_sd1_vae_decoder(
                    os.path.join(d, "ckpt", "decoder.pt")),
            })
        tokenizer = CLIPTokenizer.from_files(
            os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt"))
    else:
        print("[sd1] no --ckpt-dir: random weights (smoke-test mode)")
        models = SD1Models.initialize(jax.random.key(0), dtype=args.dtype,
                                      height=args.height, width=args.width)

    if args.tp > 1:
        from ..parallel import build_mesh
        from ..parallel.sharding import apply_tp

        mesh = build_mesh({"model": args.tp}, jax.devices()[:args.tp])
        models.params = {k: apply_tp(v, mesh)
                         for k, v in models.params.items()}

    input_images = None
    if args.input_image:
        input_images = [np.asarray(
            Image.open(p).convert("RGB").resize((args.width, args.height)))
            for p in args.input_image]

    # generate() retraces (and recompiles, minutes on the 860M UNet) on
    # EVERY call — right for a one-shot CLI invocation.  Anything calling
    # in a loop (serving, sweeps) must use SD1Generator: compile-once,
    # params as runtime arguments.
    images = generate(
        args.prompt, models, tokenizer=tokenizer,
        uncond_prompts=args.uncond_prompt, input_images=input_images,
        strength=args.strength, do_cfg=not args.no_cfg,
        cfg_scale=args.cfg_scale, height=args.height, width=args.width,
        sampler=args.sampler, n_inference_steps=args.steps, seed=args.seed,
        prompt_weighting=args.prompt_weighting)
    for i, img in enumerate(images):
        path = args.out.format(i=i)
        Image.fromarray(np.asarray(img)).save(path)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
