"""Root-cause the whole-trajectory SD1 scan compile pathology.

ROADMAP notes the single-executable 50-step SD1 trajectory (one
``lax.scan`` over the 860M UNet, ref op point 01_.../01_check.py:14-16)
hit a >45-min remote compile, so serving shipped per-step dispatch
(pipelines/sd1.py::SD1Generator). This probe bisects WHICH ingredient is
pathological by AOT-compiling (``.lower().compile()``, no execution) the
trajectory under one varied axis per arm:

- ``params``: closed-over device-array CONSTANTS (what ``generate()``
  does today) vs runtime ARGUMENTS to the jitted program. XLA treats
  closed-over arrays as literal constants of the HLO module; at 1.7 GB
  bf16 that means constant-folding/layout passes chew on gigabyte
  literals.
- ``steps``: 1 / 10 / 50 — scan bodies compile once regardless of trip
  count, so compile time should be ~flat in steps; if it is not, the
  pathology is in scan unrolling/loop passes instead.
- ``sampler``: k_lms (4-deep history ring in the carry) vs k_euler
  (no ring) — isolates the LMS carry hypothesis.
- ``donate``: donation of the initial carry on/off.

Each arm runs in a SUBPROCESS with a hard timeout (default 600 s) so a
pathological arm cannot eat the session; a timeout IS the signal.

Run on the chip:  python tools/probe_traj_compile.py            # all arms
One arm inline:   python tools/probe_traj_compile.py --arm args:k_lms:50
Results table → stderr; one JSON line per arm → stdout.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ARMS = [
    "args:k_lms:50",
    "args:k_lms:50:donate",
    "args:k_euler:50",
    "args:k_lms:10",
    "args:k_lms:1",
    "const:k_lms:1",
    "const:k_lms:10",
    "const:k_lms:50",
]


def run_arm(arm: str) -> dict:
    mode, sampler, steps = arm.split(":")[:3]
    donate = arm.endswith(":donate")
    n_steps = int(steps)

    import jax
    import jax.numpy as jnp

    from from_ddpm_to_stable_diffusion_tpu.ops import embeddings as emb_ops
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import SD1Models
    from from_ddpm_to_stable_diffusion_tpu.samplers.k_samplers import (
        KSamplerConfig, make_sampler_body, sigma_tables)

    t0 = time.perf_counter()
    models = SD1Models.initialize(jax.random.key(0), dtype="bf16")
    init_s = time.perf_counter() - t0
    cfg = KSamplerConfig(method=sampler, n_inference_steps=n_steps)
    tables = sigma_tables(cfg)
    context = jnp.zeros((2, 77, 768), jnp.bfloat16)
    latents = jnp.zeros((1, 64, 64, 4), jnp.float32)

    def trajectory(unet_params, latents, context):
        def denoise_fn(x, timestep):
            t_feat = emb_ops.sd1_time_embedding(timestep[None])
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.broadcast_to(t_feat, (2, 320))
            out = models.unet.apply({"params": unet_params}, xx, context,
                                    tt)
            cond, uncond = jnp.split(out, 2, axis=0)
            return uncond + 7.5 * (cond - uncond)

        body, make_carry, extract = make_sampler_body(denoise_fn, cfg,
                                                      tables=tables)
        carry, _ = jax.lax.scan(body, make_carry(latents),
                                jnp.arange(n_steps))
        return extract(carry)

    t0 = time.perf_counter()
    if mode == "args":
        fn = jax.jit(trajectory,
                     donate_argnums=(1,) if donate else ())
        lowered = fn.lower(models.params["unet"], latents, context)
    else:  # const: params captured — the generate() shape
        p = models.params["unet"]
        fn = jax.jit(lambda lat, ctx: trajectory(p, lat, ctx))
        lowered = fn.lower(latents, context)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    compile_s = time.perf_counter() - t0
    return {"arm": arm, "init_s": round(init_s, 1),
            "lower_s": round(lower_s, 1), "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--arm", help="run ONE arm inline (mode:sampler:steps)")
    ap.add_argument("--timeout", type=float, default=600.0,
                    help="per-arm wall limit when driving subprocesses")
    ap.add_argument("--arms", nargs="*", default=None)
    args = ap.parse_args()

    if args.arm:
        print(json.dumps(run_arm(args.arm)))
        return

    rows = []
    for arm in args.arms or ARMS:
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm", arm],
                capture_output=True, text=True, timeout=args.timeout)
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() \
                else ""
            row = json.loads(line) if line.startswith("{") else {
                "arm": arm, "error": (out.stderr or "")[-400:]}
        except subprocess.TimeoutExpired:
            row = {"arm": arm, "timeout_s": round(time.perf_counter() - t0)}
        rows.append(row)
        print(json.dumps(row))
        print(f"[traj-compile] {row}", file=sys.stderr)

    print("\n| arm | lower s | compile s |", file=sys.stderr)
    print("|---|---|---|", file=sys.stderr)
    for r in rows:
        if "compile_s" in r:
            right = str(r["compile_s"])
        elif "timeout_s" in r:
            right = f"TIMEOUT >{r['timeout_s']}s"
        else:
            right = "ERROR"
        print(f"| {r['arm']} | {r.get('lower_s', '—')} | {right} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
