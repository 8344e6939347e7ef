"""Measure SD1Generator loop="trajectory" vs loop="steps" on the chip.

Follow-up to tools/probe_traj_compile.py, which root-caused the
historical ">45-min whole-trajectory compile" to closing over the 1.7 GB
bf16 param tree as HLO constants (the args-mode 50-step scan compiles in
~31 s, flat in step count). This probe answers the remaining question:
does the one-executable trajectory actually BUY anything end to end?

The candidate win is host-dispatch elimination: the steps-mode pipeline
pays ~50 × (dispatch + donation bookkeeping) per image; BENCH_r04 shows
20.3 ms device step vs 21.2 ms wall amortized (1.06 s / 50 steps), so
the recoverable gap is ≈0.9 ms/step ≈ 4-5% e2e.

Both generators share ONE SD1Models (same random weights, ~3.4 GB HBM for
the pair of mode caches is fine: params are shared, only executables
differ). Run: python tools/probe_traj_e2e.py [--steps 50] [--iters 3]
One JSON line per mode on stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (SD1Generator,
                                                                 SD1Models)

    print(f"[traj-e2e] devices: {jax.devices()}", file=sys.stderr)
    models = SD1Models.initialize(jax.random.key(0), dtype="bf16")
    prompt = ["a photograph of an astronaut riding a horse"]

    for loop in ("steps", "trajectory"):
        gen = SD1Generator(models, n_inference_steps=args.steps, loop=loop)
        t0 = time.perf_counter()
        img = gen(prompt, seed=42)
        warm_s = time.perf_counter() - t0
        assert img.shape == (1, 512, 512, 3)
        t0 = time.perf_counter()
        for i in range(args.iters):
            img = gen(prompt, seed=100 + i)  # np.ndarray -> host-synced
        per_image_s = (time.perf_counter() - t0) / args.iters
        row = {"loop": loop, "warmup_s": round(warm_s, 1),
               "per_image_s": round(per_image_s, 4),
               "imgs_per_sec": round(1.0 / per_image_s, 4)}
        print(json.dumps(row))
        print(f"[traj-e2e] {row}", file=sys.stderr)


if __name__ == "__main__":
    main()
