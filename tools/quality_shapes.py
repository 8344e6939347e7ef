"""Measured generative QUALITY on the synthetic shapes distribution.

The reference's quality claim is qualitative ("dogs look like dogs" after
70 AFHQ epochs, README.md:92-94); AFHQ and every pretrained featurizer
(InceptionV3, CLIP) are absent from this image, so speed had numbers and
quality had only eyeballed PNGs. This tool gives the repo a measured,
reproducible generative-quality axis that runs entirely on-chip:

1. FEATURIZER — train the stage-04 ViT (64², patch 8, dim 256, depth 4)
   to classify shapes; held-out accuracy is reported as the featurizer's
   own certificate. Features = post-ln CLS vector (models/vit.py
   ``return_features=True``).
2. GENERATOR — train the stage-06 tiny class-conditional DDPM on 2048
   shapes for 60 epochs (the README recipe behind
   docs/assets/shapes_samples.png), CFG w=1.8 ancestral sampling.
3. METRICS (utils/metrics.py) between generated samples and HELD-OUT
   reals (disjoint RNG stream), in ViT feature space:
   - KID (unbiased MMD², poly kernel) — the headline number;
   - FID (Fréchet) in the same feature space;
   - the reals-vs-reals KID/FID NOISE FLOOR (held-out split in half);
   - the UNTRAINED-model KID/FID upper anchor (same sampler, epoch-0
     params);
   - CLASS FIDELITY: featurizer accuracy of generated images against
     their conditioning label.

Run on the chip:  python tools/quality_shapes.py --out QUALITY.md
Quick CPU smoke:  python tools/quality_shapes.py --smoke
One JSON line → stdout; markdown report → --out.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def batched_apply(fn, arrays, batch: int):
    import numpy as np

    outs = []
    n = len(arrays[0])
    for s in range(0, n, batch):
        outs.append(np.asarray(fn(*[a[s:s + batch] for a in arrays])))
    return np.concatenate(outs)


def dataset_images(ds, idxs):
    import numpy as np

    imgs, labels = zip(*(ds.load(int(i)) for i in idxs))
    return np.stack(imgs), np.asarray(labels, np.int32)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--smoke", action="store_true",
                    help="tiny sizes/epochs; validates wiring, not quality")
    ap.add_argument("--n-train", type=int, default=2048)
    ap.add_argument("--n-eval", type=int, default=768,
                    help="held-out reals AND generated samples per side")
    ap.add_argument("--ddpm-epochs", type=int, default=60)
    ap.add_argument("--vit-epochs", type=int, default=16)
    ap.add_argument("--sample-chunk", type=int, default=32,
                    help="sampling batch per scan launch (the bs128 "
                    "T=1000 executable crashes the relay TPU worker; "
                    "32 is measured-safe and compile-cached)")
    ap.add_argument("--out", default=None, help="markdown report path")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)
    if args.smoke:
        args.n_train, args.n_eval = 96, 48
        args.ddpm_epochs, args.vit_epochs = 1, 1

    import jax
    import numpy as np

    # survive relay restarts: warm executables come from the disk cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from from_ddpm_to_stable_diffusion_tpu.io.data import DataLoader
    from from_ddpm_to_stable_diffusion_tpu.io.shapes_dataset import (
        ShapesDataset)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import (
        DDPMTrainer)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.vit_trainer import (
        ViTTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.config import (
        TinySDConfig, ViTTrainConfig)
    from from_ddpm_to_stable_diffusion_tpu.utils.metrics import (
        fid_from_features, kid_from_features)

    img_size = 32 if args.smoke else 64
    train_ds = ShapesDataset(args.n_train, img_size=img_size, seed=0)
    # held-out stream: disjoint RNG (ShapesDataset hashes seed*1e6+idx)
    eval_ds = ShapesDataset(args.n_eval * 2, img_size=img_size, seed=777)

    # ---- 1. featurizer ----------------------------------------------------
    t0 = time.perf_counter()
    vit_cfg = ViTTrainConfig(
        epoch=args.vit_epochs, batch_size=96 if args.smoke else 256,
        img_size=img_size, patch_size=8, dim=256, depth=4, heads=4,
        mlp_dim=512, num_class=3, lr=3e-4, dtype="bf16",
        model_dir="/tmp/quality_vit")
    vit = ViTTrainer(vit_cfg)
    vstate = vit.create_state()
    rng = jax.random.key(11)
    for epoch in range(vit_cfg.epoch):
        for images, labels in DataLoader(train_ds, vit_cfg.batch_size,
                                         seed=epoch):
            vstate, loss, acc = vit.train_step(vstate, images, labels, rng)
    heldout_imgs, heldout_labels = dataset_images(
        eval_ds, range(args.n_eval))
    floor_imgs, _ = dataset_images(
        eval_ds, range(args.n_eval, 2 * args.n_eval))
    feat_fn = jax.jit(lambda p, x: vit.model.apply(
        {"params": p}, x, return_features=True))
    logit_fn = jax.jit(lambda p, x: vit.model.apply({"params": p}, x))
    vparams = vstate.params
    acc_heldout = float(np.mean(np.argmax(batched_apply(
        lambda x: logit_fn(vparams, x), [heldout_imgs], 256), -1)
        == heldout_labels))
    vit_s = time.perf_counter() - t0
    print(f"[quality] featurizer: held-out acc {acc_heldout:.4f} "
          f"({vit_s:.0f}s)", file=sys.stderr)

    # ---- 2. generator ------------------------------------------------------
    t0 = time.perf_counter()
    sd_cfg = TinySDConfig(
        epoch=args.ddpm_epochs, batch_size=32, img_size=img_size,
        num_class=3, channel=32 if args.smoke else 128,
        T=100 if args.smoke else 1000, w=1.8,
        model_dir="/tmp/quality_ddpm")
    trainer = DDPMTrainer(sd_cfg)
    loader = DataLoader(train_ds, sd_cfg.batch_size, seed=1)
    state0 = trainer.create_state(steps_per_epoch=len(loader))

    def sample_n(state, n, chunk=None):
        chunk = min(chunk or args.sample_chunk, n)
        labels = (np.arange(n) % 3) + 1  # 1-based; 0 = uncond
        outs = []
        for s in range(0, n, chunk):
            outs.append(np.asarray(trainer.sample(
                state, labels[s:s + chunk],
                rng=jax.random.key(1000 + s), use_ema=True)))
        return np.concatenate(outs).clip(-1, 1), labels

    untrained_imgs, _ = sample_n(state0, args.n_eval)
    state = trainer.fit(loader, state=state0, epochs=args.ddpm_epochs)
    gen_imgs, gen_labels = sample_n(state, args.n_eval)
    train_s = time.perf_counter() - t0
    print(f"[quality] DDPM {args.ddpm_epochs} epochs + "
          f"{2 * args.n_eval} samples: {train_s:.0f}s", file=sys.stderr)

    # ---- 3. metrics --------------------------------------------------------
    feats = {k: batched_apply(lambda x: feat_fn(vparams, x), [v], 256)
             for k, v in [("gen", gen_imgs), ("heldout", heldout_imgs),
                          ("floor", floor_imgs),
                          ("untrained", untrained_imgs)]}
    m = min(1000, args.n_eval)
    res = {
        "kid_gen_vs_heldout": kid_from_features(
            feats["gen"], feats["heldout"], subset_size=m),
        "kid_floor_reals_vs_reals": kid_from_features(
            feats["floor"], feats["heldout"], subset_size=m),
        "kid_untrained_vs_heldout": kid_from_features(
            feats["untrained"], feats["heldout"], subset_size=m),
        "fid_gen_vs_heldout": fid_from_features(feats["gen"],
                                                feats["heldout"]),
        "fid_floor_reals_vs_reals": fid_from_features(feats["floor"],
                                                      feats["heldout"]),
        "fid_untrained_vs_heldout": fid_from_features(feats["untrained"],
                                                      feats["heldout"]),
        "class_fidelity_acc": float(np.mean(np.argmax(batched_apply(
            lambda x: logit_fn(vparams, x), [gen_imgs], 256), -1)
            == (gen_labels - 1))),
        "featurizer_heldout_acc": acc_heldout,
        "n_eval": args.n_eval, "ddpm_epochs": args.ddpm_epochs,
        "img_size": img_size, "smoke": bool(args.smoke),
        "featurizer_train_s": round(vit_s, 1),
        "ddpm_train_sample_s": round(train_s, 1),
        "device": str(jax.devices()[0]),
    }
    res = {k: (round(v, 6) if isinstance(v, float) else v)
           for k, v in res.items()}
    print(json.dumps(res))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(res, f, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(render_md(res))
        print(f"[quality] wrote {args.out}", file=sys.stderr)
    return 0


def render_md(r: dict) -> str:
    return f"""# QUALITY — measured generative quality (shapes distribution)

Produced by `tools/quality_shapes.py` on `{r['device']}`
(img {r['img_size']}², {r['ddpm_epochs']} DDPM epochs, {r['n_eval']}
samples/side). No pretrained featurizer exists in this image, so the
featurizer is the stage-04 ViT trained on the same distribution —
held-out accuracy **{r['featurizer_heldout_acc']:.4f}** is its
certificate. All distances in its 256-d penultimate feature space.

| metric | generated vs held-out reals | reals-vs-reals floor | untrained anchor |
|---|---|---|---|
| KID (unbiased MMD²) | **{r['kid_gen_vs_heldout']:.6f}** | {r['kid_floor_reals_vs_reals']:.6f} | {r['kid_untrained_vs_heldout']:.4f} |
| FID (same features) | **{r['fid_gen_vs_heldout']:.4f}** | {r['fid_floor_reals_vs_reals']:.4f} | {r['fid_untrained_vs_heldout']:.2f} |

Class fidelity (featurizer agrees with the conditioning label on
generated images): **{r['class_fidelity_acc']:.4f}**.

Reading: the trained model's KID should sit orders of magnitude below
the untrained anchor and approach the sampling-noise floor; class
fidelity near 1.0 means CFG conditioning controls the semantics.

Recipe (exact): `ShapesDataset(n=2048, seed=0)` train split,
`ShapesDataset(seed=777)` held-out; ViT featurizer patch 8 / dim 256 /
depth 4; tiny-SD stage-06 config (channel 128, T=1000,
w=1.8, EMA sampling). Re-run: `python tools/quality_shapes.py --out
QUALITY.md --json-out docs/artifacts/quality.json`.

Timing: featurizer {r['featurizer_train_s']}s; DDPM train + sampling
{r['ddpm_train_sample_s']}s.
"""


if __name__ == "__main__":
    raise SystemExit(main())
