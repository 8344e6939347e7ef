"""Serving CLI: SD1 text→image behind a dynamic-batching HTTP endpoint.

The reference only ships the *client* side of serving (09_api/
01_replicate.py posts to Replicate's API). This is the server: a
compile-once SD1Generator behind the bucketed DynamicBatcher
(serving/batcher.py), so concurrent requests coalesce into the batch sizes
the chip actually likes (docs/SERVING_CURVE.md).

    python -m from_ddpm_to_stable_diffusion_tpu serve --ckpt-dir …/model_sd1
    curl -s localhost:8000/v1/generate -d '{"prompt":"a cat","seed":1}' > cat.png
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(prog="serve")
    ap.add_argument("--ckpt-dir", default=None,
                    help="reference model_sd1 layout; omit for random-weight"
                         " smoke mode")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--sampler", default="k_lms",
                    choices=["k_lms", "k_euler", "k_euler_ancestral",
                             "dpmpp_2m"])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=7.5)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--buckets", default="1,2,4,8",
                    help="batch-size ladder; each bucket compiles once")
    ap.add_argument("--max-wait-ms", type=float, default=25.0)
    ap.add_argument("--max-queue", type=int, default=256)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip pre-compiling every bucket before binding")
    args = ap.parse_args(argv)

    import os

    import jax

    from ..pipelines.sd1 import SD1Generator, SD1Models
    from ..serving import (DynamicBatcher, make_server,
                           serve_forever_in_thread)

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
                "unet": import_sd1_unet(
                    os.path.join(d, "ckpt", "diffusion.pt")),
                "encoder": import_sd1_vae_encoder(
                    os.path.join(d, "ckpt", "encoder.pt")),
                "decoder": import_sd1_vae_decoder(
                    os.path.join(d, "ckpt", "decoder.pt")),
            })
        tokenizer = CLIPTokenizer.from_files(
            os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt"))
    else:
        print("[serve] no --ckpt-dir: random weights (smoke-test mode)")
        models = SD1Models.initialize(jax.random.key(0), dtype=args.dtype,
                                      height=args.height, width=args.width)

    mesh = None
    if args.tp > 1:
        from ..parallel import build_mesh

        mesh = build_mesh({"model": args.tp}, jax.devices()[:args.tp])

    gen = SD1Generator(models, tokenizer=tokenizer, sampler=args.sampler,
                       n_inference_steps=args.steps,
                       cfg_scale=args.cfg_scale, height=args.height,
                       width=args.width, mesh=mesh)

    def generate_fn(prompts, negative_prompts, seeds):
        return gen(prompts, uncond_prompts=negative_prompts,
                   per_sample_seeds=list(seeds))

    buckets = sorted({int(b) for b in args.buckets.split(",")})
    batcher = DynamicBatcher(generate_fn, buckets=buckets,
                             max_wait_ms=args.max_wait_ms,
                             max_queue=args.max_queue)
    if not args.no_warmup:
        import time

        t0 = time.perf_counter()
        print(f"[serve] warming up buckets {buckets} "
              "(first compile can take minutes)…")
        batcher.warmup()
        print(f"[serve] warmup done in {time.perf_counter() - t0:.1f}s")

    server = make_server(batcher, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(f"[serve] listening on http://{host}:{port} "
          f"(POST /v1/generate, GET /healthz, GET /metrics)")
    thread = serve_forever_in_thread(server)
    try:
        thread.join()
    except KeyboardInterrupt:
        print("[serve] shutting down")
        server.shutdown()
        batcher.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
