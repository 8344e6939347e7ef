"""On-chip SD3 end-to-end artifact at the BASELINE op point.

Drives the SHIPPED SD3Inferencer.gen_image (prompt-tokens → image) at the
reference demo's operating point — 1024×1024, 50 steps, CFG 5.0, shift 3.0,
seed 1 (/root/reference/02_stable_diffusion-3/01_check.py:9-28) — with the
FULL-SCALE SD3-medium stack (MMDiT depth 24, CLIP-L/G, T5-XXL, 16-ch VAE)
stood up from seeded random weights (no checkpoints exist in this image)
in the int8 all-resident serving mode.

Produces:
- docs/artifacts/sd3_e2e_seed1.png         — the decoded image
- docs/artifacts/sd3_e2e_traj.png          — 50-step latent-preview strip
- tests/goldens/sd3_e2e_hash.json          — sha256 of image + trajectory
  (per-seed determinism record: re-running this tool on a v5e must
  reproduce the hashes bit-for-bit)
- stdout: measured gen_image wall time (cold + warm call)

Usage: python tools/sd3_e2e_artifact.py [--steps 50] [--res 1024] [--bf16]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fdsd_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import (  # noqa: E402
    SD3Inferencer, SD3Models)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 + text-encoder phase offload instead of the "
                         "int8 all-resident mode")
    args = ap.parse_args()

    t0 = time.perf_counter()
    models = SD3Models.initialize(jax.random.key(0), dtype="bf16",
                                  depth=24, pos_embed_max_size=192,
                                  int8=not args.bf16)
    print(f"[e2e] full-scale init ({'bf16' if args.bf16 else 'int8'}): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    stats = jax.local_devices()[0].memory_stats() or {}
    print(f"[e2e] HBM live {stats.get('bytes_in_use', 0) / 2**30:.2f} GiB "
          f"peak {stats.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB",
          flush=True)

    inf = SD3Inferencer(models, shift=3.0)
    rng = np.random.default_rng(1)
    clip_ids = rng.integers(0, 49408, (1, 77)).astype(np.int32)
    g_ids = rng.integers(0, 49408, (1, 77)).astype(np.int32)
    t5_ids = rng.integers(0, 32128, (1, 77)).astype(np.int32)

    def run(keep_traj):
        return inf.gen_image(
            clip_ids, t5_tokens=t5_ids, clip_g_tokens=g_ids,
            width=args.res, height=args.res, steps=args.steps,
            cfg_scale=5.0, seed=1, keep_trajectory=keep_traj,
            offload_text_encoders=args.bf16)

    t0 = time.perf_counter()
    img, traj = run(True)
    cold = time.perf_counter() - t0
    print(f"[e2e] gen_image cold (compile incl.): {cold:.1f}s", flush=True)

    if not args.bf16:   # all-resident: a second prompt needs no re-init
        t0 = time.perf_counter()
        img2, traj2 = run(True)
        warm = time.perf_counter() - t0
        print(f"[e2e] gen_image warm: {warm:.2f}s "
              f"({args.steps} steps + text encode + VAE decode)", flush=True)
        assert (np.asarray(img) == np.asarray(img2)).all(), \
            "per-seed determinism violated"

    img = np.asarray(img)
    traj = np.asarray(traj)
    h_img = hashlib.sha256(img.tobytes()).hexdigest()
    h_traj = hashlib.sha256(traj.tobytes()).hexdigest()
    print(f"[e2e] image {img.shape} sha256 {h_img[:16]}…", flush=True)
    print(f"[e2e] trajectory {traj.shape} sha256 {h_traj[:16]}…", flush=True)

    os.makedirs("docs/artifacts", exist_ok=True)
    from PIL import Image

    Image.fromarray(img[0]).save("docs/artifacts/sd3_e2e_seed1.png")
    # preview strip: every 5th step, side by side
    strip = np.concatenate(list(traj[::5]), axis=1)
    Image.fromarray(strip).save("docs/artifacts/sd3_e2e_traj.png")
    record = {
        "op_point": {"res": args.res, "steps": args.steps, "cfg": 5.0,
                     "shift": 3.0, "seed": 1,
                     "mode": "bf16+offload" if args.bf16 else
                             "int8 all-resident"},
        "weights": "SD3Models.initialize(key(0), depth=24, "
                   "pos_embed_max_size=192)",
        "image_sha256": h_img,
        "trajectory_sha256": h_traj,
        "gen_image_cold_s": round(cold, 2),
    }
    if not args.bf16:
        record["gen_image_warm_s"] = round(warm, 2)
    with open("tests/goldens/sd3_e2e_hash.json", "w") as f:
        json.dump(record, f, indent=1)
    print("[e2e] artifacts written", flush=True)


if __name__ == "__main__":
    main()
