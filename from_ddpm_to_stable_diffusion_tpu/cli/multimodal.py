"""Stage-07⁺ CLI: train the TPU-native TinyVLM and chat with it.

The reference's stage 07 is a gated MiniCPM-V library call
(``cli.demos multimodal``); this is the from-scratch trainable
counterpart: image + prompt → generated caption text.

Examples:
    python -m from_ddpm_to_stable_diffusion_tpu multimodal train \
        --epochs 30 --out vlm_demo.png --ckpt-dir /tmp/vlm
    python -m from_ddpm_to_stable_diffusion_tpu multimodal chat \
        --ckpt-dir /tmp/vlm --image photo.png
"""

from __future__ import annotations

import argparse


def _build(args):
    from ..io.shapes_dataset import VLM_VOCAB
    from ..models.tiny_vlm import TinyVLM
    from ..utils.dtypes import POLICIES

    return TinyVLM(vocab_size=len(VLM_VOCAB), dim=args.dim,
                   depth=args.depth,
                   max_text_len=10 if args.qa else 8,
                   dtype=POLICIES[args.dtype].compute_dtype)


def _restore(trainer, args):
    from ..utils.checkpoint import CheckpointManager

    state = trainer.create_state(args.img_size)
    ckpt = CheckpointManager(args.ckpt_dir)
    restored, _ = ckpt.restore(template=state)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    return restored


def main(argv=None):
    ap = argparse.ArgumentParser(prog="multimodal")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("train", "chat", "eval"):
        g = sub.add_parser(name)
        g.add_argument("--img-size", type=int, default=64)
        g.add_argument("--dim", type=int, default=128)
        g.add_argument("--depth", type=int, default=4)
        g.add_argument("--dtype", default="bf16")
        g.add_argument("--ckpt-dir", default=None)
        g.add_argument("--qa", action="store_true",
                       help="image+question→answer mode (VQA dataset, "
                            "question-masked loss, --question at chat)")
        if name == "train":
            g.add_argument("--epochs", type=int, default=30)
            g.add_argument("--examples", type=int, default=1024)
            g.add_argument("--batch-size", type=int, default=64)
            g.add_argument("--lr", type=float, default=3e-4)
            g.add_argument("--out", default="vlm_demo.png",
                           help="demo grid: test images + captions")
        if name == "chat":
            g.add_argument("--image", required=True)
            g.add_argument("--question", default=None,
                           help='e.g. "what color ?" (requires --qa)')
        if name == "eval":
            g.add_argument("--out", default=None,
                           help="also write the captioned demo grid here")
    args = ap.parse_args(argv)

    import numpy as np

    from ..io import CaptionedShapesDataset, DataLoader
    from ..pipelines.vlm_trainer import VLMTrainer

    model = _build(args)

    from ..io.shapes_dataset import VQA_ANSWER_START, VQAShapesDataset

    ds_cls = VQAShapesDataset if args.qa else CaptionedShapesDataset
    answer_start = VQA_ANSWER_START if args.qa else 0

    if args.cmd == "train":
        data = ds_cls(args.examples, args.img_size)
        loader = DataLoader(data, args.batch_size)
        steps = len(loader) * args.epochs
        trainer = VLMTrainer(model, lr=args.lr, warmup_steps=steps // 10,
                             total_steps=steps, answer_start=answer_start)
        state = trainer.fit(loader, epochs=args.epochs,
                            image_size=args.img_size,
                            checkpoint_dir=args.ckpt_dir)
        # held-out eval: a different seed than training data
        test = ds_cls(64, args.img_size, seed=999)
        if args.qa:
            acc = trainer.qa_accuracy(state, test, n=64)
            print(f"held-out ANSWER exact-match accuracy: {acc:.2%}")
            _qa_demo(model, state, test, args.out)
        else:
            acc = trainer.caption_accuracy(state, test, n=64)
            print(f"held-out caption exact-match accuracy: {acc:.2%}")
            _demo_grid(model, state, test, args.out)
        return 0

    if not args.ckpt_dir:
        ap.error(f"{args.cmd} needs --ckpt-dir")
    trainer = VLMTrainer(model)
    state = _restore(trainer, args)

    if args.cmd == "eval":
        test = ds_cls(64, args.img_size, seed=999)
        if args.qa:
            acc = trainer.qa_accuracy(state, test, n=64)
            print(f"held-out ANSWER exact-match accuracy: {acc:.2%}")
            if args.out:
                _qa_demo(model, state, test, args.out)
        else:
            acc = trainer.caption_accuracy(state, test, n=64)
            print(f"held-out caption exact-match accuracy: {acc:.2%}")
            if args.out:
                _demo_grid(model, state, test, args.out)
        return 0

    # chat: arbitrary image file (+ question in --qa mode) → text
    import jax.numpy as jnp
    from PIL import Image

    from ..models.tiny_vlm import greedy_decode

    img = Image.open(args.image).convert("RGB").resize(
        (args.img_size, args.img_size))
    x = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    data = ds_cls(1, args.img_size)
    if args.qa:
        question = args.question or "describe it ."
        ids = greedy_decode(model, state.params, x,
                            max_len=model.max_text_len,
                            prompt_ids=data.encode_question(question))
        print(data.decode_answer(np.asarray(ids)[0]))
    else:
        ids = greedy_decode(model, state.params, x,
                            max_len=model.max_text_len)
        print(data.decode(np.asarray(ids)[0]))
    return 0


def _qa_demo(model, state, dataset, out_path, n: int = 12):
    """README artifact: held-out images, each asked ITS question; tiles
    show 'Q: … / A: …' under the image."""
    import jax.numpy as jnp
    import numpy as np

    from ..io.shapes_dataset import VQA_ANSWER_START
    from ..models.tiny_vlm import greedy_decode

    imgs, toks = zip(*(dataset.load(i) for i in range(n)))
    prompts = np.stack(toks)[:, :VQA_ANSWER_START]
    got = greedy_decode(model, state.params,
                        jnp.asarray(np.stack(imgs)),
                        max_len=model.max_text_len, prompt_ids=prompts)
    questions = [" ".join(dataset.vocab[i] for i in p[1:]) for p in prompts]
    answers = [dataset.decode_answer(g) for g in np.asarray(got)]
    try:
        from PIL import Image, ImageDraw

        s = imgs[0].shape[0]
        pad = 26
        cols = 4
        cell = max(s + 8, 118)
        rows = (n + cols - 1) // cols
        canvas = Image.new("RGB", (cols * cell, rows * (s + pad)), "black")
        draw = ImageDraw.Draw(canvas)
        for i, (img, q, a) in enumerate(zip(imgs, questions, answers)):
            r, c = divmod(i, cols)
            tile = ((np.asarray(img) + 1.0) * 127.5).clip(0, 255).astype(
                np.uint8)
            canvas.paste(Image.fromarray(tile),
                         (c * cell + (cell - s) // 2, r * (s + pad)))
            draw.text((c * cell + 2, r * (s + pad) + s), f"Q: {q}",
                      fill="gray")
            draw.text((c * cell + 2, r * (s + pad) + s + 12), f"A: {a}",
                      fill="white")
        canvas.save(out_path)
        print(f"wrote {out_path}")
    except ImportError:
        for q, a, w in zip(questions, answers, toks):
            print(f"Q: {q!r}  A: {a!r}  want: "
                  f"{dataset.decode_answer(w)!r}")


def _demo_grid(model, state, dataset, out_path, n: int = 9):
    """README artifact: a grid of held-out images captioned by the model."""
    import jax.numpy as jnp
    import numpy as np

    from ..models.tiny_vlm import greedy_decode

    imgs, want = zip(*(dataset.load(i) for i in range(n)))
    got = greedy_decode(model, state.params,
                        jnp.asarray(np.stack(imgs)),
                        max_len=model.max_text_len)
    captions = [dataset.decode(g) for g in np.asarray(got)]
    try:
        from PIL import Image, ImageDraw

        s = imgs[0].shape[0]
        pad = 14
        cols = 3
        cell = max(s + 8, 132)   # room for the longest caption text
        rows = (n + cols - 1) // cols
        canvas = Image.new("RGB", (cols * cell, rows * (s + pad)), "black")
        draw = ImageDraw.Draw(canvas)
        for i, (img, cap) in enumerate(zip(imgs, captions)):
            r, c = divmod(i, cols)
            tile = ((np.asarray(img) + 1.0) * 127.5).clip(0, 255).astype(
                np.uint8)
            canvas.paste(Image.fromarray(tile),
                         (c * cell + (cell - s) // 2, r * (s + pad)))
            draw.text((c * cell + 2, r * (s + pad) + s + 1), cap,
                      fill="white")
        canvas.save(out_path)
        print(f"wrote {out_path}")
    except ImportError:
        for cap, w in zip(captions, want):
            print(f"got: {cap!r}  want: {dataset.decode(w)!r}")


if __name__ == "__main__":
    raise SystemExit(main())
