"""Weights-day FID/KID/CLIP sweep: generate N SD1 images, score vs reals.

Step 4 of tools/validate_real_weights.sh (ROADMAP "first action when
weights are available"). Imports the reference's SD1 checkpoints
(reference 01_.../model_loader.py layout), generates ``--n`` images at the
BASELINE op point across a fixed prompt set, loads reals from an
ImageFolder tree, and reports:

- inception FID + KID (pytorch-fid featurizer) when ``--inception`` points
  at pt_inception-2015-12-05-6726825d.pth — the canonical number;
- CLIP-FID + CLIP-KID when ``--clip`` points at an OpenAI ViT-L/14 ckpt;
- with neither: a notice (no pretrained featurizer → no meaningful FID).

Writes one JSON dict to --out and prints it.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PROMPTS = [
    "a photo of a cat",
    "a photo of a dog",
    "a photo of a wild animal",
    "a close-up photograph of an animal face",
]


def load_reals(root: str, n: int, size: int = 299):
    import numpy as np

    from from_ddpm_to_stable_diffusion_tpu.io.data import ImageFolderDataset

    ds = ImageFolderDataset(root, img_size=size, normalize=False,
                            to_unit_range=True)
    idx = np.linspace(0, len(ds) - 1, min(n, len(ds))).astype(int)
    imgs = np.stack([ds[i][0] for i in idx])        # (-1, 1) NHWC
    return ((imgs + 1.0) * 127.5).clip(0, 255).astype("uint8")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt-dir", required=True,
                    help="model_sd1 dir (ckpt/*.pt + vocab/merges)")
    ap.add_argument("--reals", required=True, help="ImageFolder of reals")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=7.5)
    ap.add_argument("--inception", help="pt_inception-*.pth")
    ap.add_argument("--clip", help="OpenAI CLIP ViT-L/14 .pt")
    ap.add_argument("--out", default="/tmp/metrics.json")
    args = ap.parse_args(argv)

    import numpy as np

    from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import CLIPTokenizer
    from from_ddpm_to_stable_diffusion_tpu.io.weights import (
        import_sd1_clip, import_sd1_unet, import_sd1_vae_decoder,
        import_sd1_vae_encoder)
    from from_ddpm_to_stable_diffusion_tpu.models.sd1 import (
        CLIPText, SD1UNet, VAEDecoder, VAEEncoder)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (
        SD1Generator, SD1Models)
    from from_ddpm_to_stable_diffusion_tpu.utils import metrics
    from from_ddpm_to_stable_diffusion_tpu.utils.dtypes import POLICIES

    d, dt = args.ckpt_dir, POLICIES["bf16"].compute_dtype
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
    gen = SD1Generator(models, tokenizer=tokenizer, sampler="k_lms",
                       n_inference_steps=args.steps,
                       cfg_scale=args.cfg_scale)
    fakes = []
    bs = 4
    for i in range(0, args.n, bs):
        prompts = [PROMPTS[(i + j) % len(PROMPTS)] for j in range(bs)]
        fakes.append(np.asarray(gen(prompts, seed=1000 + i)))
    fakes = np.concatenate(fakes)[:args.n]          # uint8 NHWC
    reals = load_reals(args.reals, args.n)

    result = {"n": int(args.n), "steps": args.steps,
              "cfg_scale": args.cfg_scale}
    if args.inception:
        from from_ddpm_to_stable_diffusion_tpu.io.weights_inception import (
            import_inception_fid)
        params = import_inception_fid(args.inception)
        fa = metrics.inception_features(fakes.astype("float32") / 255., params)
        fb = metrics.inception_features(reals.astype("float32") / 255., params)
        result["fid"] = float(metrics.fid_from_features(fa, fb))
        result["kid"] = float(metrics.kid_from_features(fa, fb))
    if args.clip:
        from PIL import Image

        from from_ddpm_to_stable_diffusion_tpu.io.weights_clip import (
            import_openai_clip)
        from from_ddpm_to_stable_diffusion_tpu.models.clip import CLIP

        clip_params, cfg = import_openai_clip(args.clip)
        clip_model = CLIP(**cfg)
        res = cfg["image_resolution"]

        def prep(u8):      # uint8 NHWC -> [-1, 1] float at tower res
            out = np.stack([
                np.asarray(Image.fromarray(im).resize((res, res),
                                                      Image.BICUBIC))
                for im in u8])
            return out.astype(np.float32) / 127.5 - 1.0

        fa = np.asarray(metrics.clip_image_features(prep(fakes), clip_model,
                                                    clip_params))
        fb = np.asarray(metrics.clip_image_features(prep(reals), clip_model,
                                                    clip_params))
        result["clip_fid"] = float(metrics.fid_from_features(fa, fb))
        result["clip_kid"] = float(metrics.kid_from_features(fa, fb))
    if not (args.inception or args.clip):
        result["note"] = ("no featurizer weights given; pass --inception "
                          "or --clip for FID")

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
