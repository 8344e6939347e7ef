"""Device-time attribution for the hot steps (SD1 denoise / tiny-SD train).

Captures a ``jax.profiler`` trace (perfetto JSON) around N executions of the
shipped step executable, then parses the XLA-Ops device track and groups op
time by category. On the axon relay ``block_until_ready`` is not an honest
sync; the profiler's device timeline is the ground truth (see
docs/SD1_STEP_PROFILE.md).

Usage:  python tools/profile_step.py sd1|tiny [--iters N] [--top K]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _category(name: str) -> str:
    """Map an XLA op name to a coarse cost bucket."""
    base = name.split("/")[-1]
    for prefix in ("fusion", "convolution", "copy", "convert", "reshape",
                   "transpose", "slice", "concatenate", "pad", "broadcast",
                   "reduce", "scatter", "gather", "dynamic", "bitcast",
                   "custom-call", "dot", "rng", "select", "add", "multiply",
                   "tuple", "all-reduce", "iota", "compare"):
        if base.startswith(prefix):
            # keep pallas kernels visible by their custom-call payload
            if prefix == "custom-call" and "tpu_custom_call" in name:
                return "pallas"
            return prefix
    return base.split(".")[0]


def profile(run_step, iters: int, log_dir: str):
    run_step()  # warm
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        for _ in range(iters):
            run_step()

    files = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        raise SystemExit(f"no perfetto trace found under {log_dir}")
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"]
    # find thread ids whose name says XLA Ops (device op track)
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname = e.get("args", {}).get("name", "")
            if "XLA Ops" in tname:
                op_tids.add((e.get("pid"), e.get("tid")))
    per_cat = collections.Counter()
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        per_cat[_category(name)] += dur
        per_op[name] += dur
        total += dur
    return per_cat, per_op, total


def build_sd1():
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (SD1Generator,
                                                                 SD1Models)
    from from_ddpm_to_stable_diffusion_tpu.samplers.k_samplers import (
        make_sampler_body)

    models = SD1Models.initialize(jax.random.key(0), dtype="bf16")
    gen = SD1Generator(models, n_inference_steps=50)
    _, make_carry, _ = make_sampler_body(lambda x, t: x, gen.cfg,
                                         rng=jax.random.key(0),
                                         tables=gen.tables)
    latents = jax.random.normal(jax.random.key(1), (1, 64, 64, 4))
    ctx = gen._clip(models.params["clip"], jnp.zeros((2, 77), jnp.int32))
    state = [(make_carry(latents), ctx, jax.random.key(0), jnp.int32(0))]
    step = gen._get_step(1)
    up = models.params["unet"]

    def run():
        state[0] = step(up, state[0])
        jax.block_until_ready(state[0][0][0])

    return run


def build_tiny():
    from from_ddpm_to_stable_diffusion_tpu.parallel import shard_batch
    from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import (
        DDPMTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig

    cfg = TinySDConfig(dtype="bf16", dropout=0.1)
    trainer = DDPMTrainer(cfg)
    state = [trainer.create_state(steps_per_epoch=100)]
    rng = jax.random.key(0)
    images = np.random.default_rng(0).uniform(
        -1, 1, (cfg.batch_size, cfg.img_size, cfg.img_size,
                cfg.img_channel)).astype(np.float32)
    labels = np.arange(cfg.batch_size, dtype=np.int32) % cfg.num_class
    images, labels = shard_batch(trainer.mesh, (images, labels))

    def run():
        state[0], loss = trainer.train_step(state[0], images, labels, rng)
        float(loss)

    return run


def build_sd3(int8: bool):
    # the harness lives in bench.py (make_sd3_denoise) so the profiler and
    # the benchmark always measure the SAME program
    import bench

    denoise, params, _ = bench.make_sd3_denoise(int8)
    state = [jax.random.normal(jax.random.key(1), (2, 128, 128, 16))]

    def run():
        state[0] = denoise(params, state[0], jnp.float32(0.7))
        jax.block_until_ready(state[0])

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", choices=["sd1", "tiny", "sd3", "sd3i8"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cat", default=None,
                    help="also list the top ops WITHIN this category "
                         "(e.g. copy, convert) to attribute layout mass")
    ap.add_argument("--log-dir", default="/tmp/fdsd_profile")
    args = ap.parse_args()

    run = {"sd1": build_sd1, "tiny": build_tiny,
           "sd3": lambda: build_sd3(False),
           "sd3i8": lambda: build_sd3(True)}[args.target]()
    per_cat, per_op, total = profile(run, args.iters, args.log_dir)

    print(f"== {args.target}: device op time {total / args.iters:.2f} ms/step "
          f"({args.iters} steps) ==")
    print("\n-- by category (ms/step) --")
    for cat, ms in per_cat.most_common():
        print(f"  {ms / args.iters:8.3f}  {cat}")
    print(f"\n-- top {args.top} ops (ms/step) --")
    for name, ms in per_op.most_common(args.top):
        print(f"  {ms / args.iters:8.3f}  {name[:110]}")
    if args.cat:
        print(f"\n-- top ops in category '{args.cat}' (ms/step) --")
        shown = 0
        for name, ms in per_op.most_common():
            if _category(name) != args.cat:
                continue
            print(f"  {ms / args.iters:8.3f}  {name[:110]}")
            shown += 1
            if shown >= 20:
                break


if __name__ == "__main__":
    main()
