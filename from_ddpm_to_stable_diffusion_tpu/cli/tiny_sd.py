"""Stage-06 CLI: train / sample the tiny class-conditional DDPM.

Mirrors 02_train_direct.py + 03_train_with_vae.py surfaces; YAML configs
are key-compatible with 00_assets/yml/tiny_sd_direct.yml.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tiny_sd")
    sub = ap.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train", help="train the tiny DDPM")
    tr.add_argument("--config", required=True, help="YAML config path")
    tr.add_argument("--data-dir", default=None,
                    help="AFHQ-style image-folder root (class subdirs)")
    tr.add_argument("--synthetic", action="store_true",
                    help="use a synthetic dataset (no files needed)")
    tr.add_argument("--epochs", type=int, default=None)

    sa = sub.add_parser("sample", help="CFG-sample a grid from a checkpoint")
    sa.add_argument("--config", required=True)
    sa.add_argument("--ckpt", required=True)
    sa.add_argument("--out", default="samples.png")
    sa.add_argument("--labels", default="1,2,3,1,2,3,1")

    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from ..io import DataLoader, ImageFolderDataset, SyntheticImageDataset
    from ..pipelines.ddpm_trainer import DDPMTrainer
    from ..utils.config import TinySDConfig

    cfg = TinySDConfig.from_yaml(args.config)
    trainer = DDPMTrainer(cfg)

    if args.cmd == "train":
        data_dir = args.data_dir or cfg.data_dir
        if args.synthetic or not data_dir:
            ds = SyntheticImageDataset(n=8 * cfg.batch_size,
                                       img_size=cfg.img_size,
                                       num_classes=cfg.num_class)
        else:
            ds = ImageFolderDataset(data_dir, cfg.img_size,
                                    to_unit_range=True)
        loader = DataLoader(ds, cfg.batch_size, seed=cfg.seed)
        trainer.fit(loader, epochs=args.epochs,
                    checkpoint_dir=cfg.model_dir)
        return 0

    # sample
    from PIL import Image

    from ..ops.image import image_grid, to_uint8
    from ..utils.checkpoint import CheckpointManager

    state = trainer.create_state(steps_per_epoch=1)
    mgr = CheckpointManager(args.ckpt)
    restored, step = mgr.restore(template=jax.device_get(state))
    if restored is None:
        raise SystemExit(f"no checkpoint found under {args.ckpt}")
    labels = np.asarray([int(x) for x in args.labels.split(",")])
    samples = trainer.sample(restored, labels)
    grid = image_grid(np.asarray(to_uint8(samples)), nrow=cfg.nrow)
    Image.fromarray(grid).save(args.out)
    print(f"wrote {args.out} (from epoch {step})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
