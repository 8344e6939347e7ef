#!/usr/bin/env bash
# Weights-day runbook: one command to close real-checkpoint parity the
# moment the reference's assets exist (ROADMAP.md "Blocked on assets").
#
# Usage:
#   tools/validate_real_weights.sh ASSETS_DIR [OUT_DIR]
#   tools/validate_real_weights.sh --smoke          # CPU wiring check only
#
# ASSETS_DIR follows the reference layout (reference README.md:12-31):
#   model_sd1/ckpt/{clip,diffusion,encoder,decoder}.pt
#   model_sd1/{vocab.json,merges.txt}
#   model_sd3/sd3_medium.safetensors (+ text_encoders/*.safetensors, spiece.model)
#   afhq/{train,val}/...                                   (optional: FID reals)
#   pt_inception-2015-12-05-6726825d.pth                   (optional: true FID)
#   ViT-L-14.pt                                            (optional: CLIP-score)
#
# What it runs, in order (each step skips with a notice if its asset is
# absent):
#   1. SD1 golden image at the BASELINE op point (512x512, 50 steps,
#      CFG 7.5, k-LMS, seed 42 — ref 01_.../01_check.py:14-16).
#   2. SD1 torch-reference image with the same inputs (needs
#      /root/reference + torch) for side-by-side comparison.
#   3. SD3-medium image at its op point (1024x1024, 50 steps, CFG 5,
#      shift 3, seed 1 — ref 02_.../01_check.py:11-19).
#   4. FID / CLIP-score of a 64-image SD1 sweep vs AFHQ reals
#      (utils/metrics.py; InceptionV3 if the .pth exists, else CLIP-FID).
# Parity definition (SURVEY.md section "RNG parity"): distribution-level
# (FID/CLIP-score), plus per-seed determinism of OUR pipeline; torch RNG
# sequences are not bit-reproducible in JAX.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--smoke" ]]; then
    # CPU-reachable wiring: imports, CLI arg surfaces, metrics math, and
    # the importer key-maps — everything that can break before weights
    # even load. Run by tests/test_cli.py::test_validate_real_weights_smoke.
    # the exact CLI surfaces the runbook drives must parse
    python -m from_ddpm_to_stable_diffusion_tpu.cli.sd1 generate --help \
        > /dev/null
    python -m from_ddpm_to_stable_diffusion_tpu.cli.sd3 generate --help \
        > /dev/null
    python tools/fid_sweep.py --help > /dev/null
    python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

# importer layers expose the entry points the runbook's CLIs call
from from_ddpm_to_stable_diffusion_tpu.io.weights import (  # noqa: F401
    import_sd1_clip, import_sd1_unet, import_sd1_vae_decoder,
    import_sd1_vae_encoder, load_safetensors_dict)
from from_ddpm_to_stable_diffusion_tpu.io.weights_sd3 import (  # noqa: F401
    import_sd3_checkpoint)
from from_ddpm_to_stable_diffusion_tpu.io.weights_inception import (  # noqa: F401,E501
    import_inception_fid)

# metrics math runs on synthetic features (what step 4 feeds it)
from from_ddpm_to_stable_diffusion_tpu.utils import metrics
r = np.random.default_rng(0)
a, b = r.normal(size=(96, 32)), r.normal(0.3, 1.0, size=(96, 32))
fid = metrics.fid_from_features(a, b)
kid = metrics.kid_from_features(a, b)
assert np.isfinite(fid) and fid > 0 and np.isfinite(kid)
print("validate_real_weights --smoke OK")
EOF
    exit 0
fi

ASSETS="${1:?usage: $0 ASSETS_DIR [OUT_DIR] | --smoke}"
OUT="${2:-/tmp/weights_validation}"
mkdir -p "$OUT"
note() { echo "== $*" >&2; }

SD1_DIR="$ASSETS/model_sd1"
if [[ -f "$SD1_DIR/ckpt/diffusion.pt" ]]; then
    note "SD1 golden image (512x512, 50 steps, CFG 7.5, k-LMS, seed 42)"
    python -m from_ddpm_to_stable_diffusion_tpu.cli.sd1 generate \
        --prompt "a photograph of an astronaut riding a horse" \
        --steps 50 --cfg-scale 7.5 --sampler k_lms --seed 42 \
        --height 512 --width 512 \
        --ckpt-dir "$SD1_DIR" --out "$OUT/sd1_jax.png"
    # determinism: same seed twice must be byte-identical
    python -m from_ddpm_to_stable_diffusion_tpu.cli.sd1 generate \
        --prompt "a photograph of an astronaut riding a horse" \
        --steps 50 --cfg-scale 7.5 --sampler k_lms --seed 42 \
        --height 512 --width 512 \
        --ckpt-dir "$SD1_DIR" --out "$OUT/sd1_jax_repeat.png"
    cmp "$OUT/sd1_jax.png" "$OUT/sd1_jax_repeat.png" \
        && note "SD1 per-seed determinism OK"
else
    note "SKIP SD1: $SD1_DIR/ckpt/diffusion.pt not found"
fi

if [[ -f "$SD1_DIR/ckpt/diffusion.pt" && -d /root/reference ]]; then
    note "SD1 torch-reference image (same op point) for side-by-side"
    python - "$SD1_DIR" "$OUT" <<'EOF' || note "torch reference run failed (non-fatal)"
import sys
sys.path.insert(0, "/root/reference/01_stable_diffusion-1")
from stable_diffusion_pytorch import pipeline, model_loader
models = model_loader.preload_models("cpu")
imgs = pipeline.generate(
    ["a photograph of an astronaut riding a horse"], models=models,
    n_inference_steps=50, cfg_scale=7.5, sampler="k_lms", seed=42,
    device="cpu")
imgs[0].save(sys.argv[2] + "/sd1_torch.png")
EOF
fi

SD3_CKPT="$(ls "$ASSETS"/model_sd3/*.safetensors 2>/dev/null | head -1 || true)"
if [[ -n "$SD3_CKPT" ]]; then
    note "SD3 image (1024x1024, 50 steps, CFG 5, shift 3, seed 1)"
    python -m from_ddpm_to_stable_diffusion_tpu.cli.sd3 generate \
        --prompt "a photo of a cat holding a sign that says hello world" \
        --steps 50 --cfg-scale 5 --shift 3 --seed 1 \
        --width 1024 --height 1024 \
        --ckpt "$SD3_CKPT" --out "$OUT/sd3_jax.png"
else
    note "SKIP SD3: no $ASSETS/model_sd3/*.safetensors"
fi

if [[ -f "$SD1_DIR/ckpt/diffusion.pt" && -d "$ASSETS/afhq/val" ]]; then
    note "FID / CLIP-score: 64-image SD1 sweep vs AFHQ reals"
    INCEPTION="$(ls "$ASSETS"/pt_inception-*.pth 2>/dev/null | head -1 || true)"
    CLIP_CKPT="$(ls "$ASSETS"/ViT-L-14.pt 2>/dev/null | head -1 || true)"
    python tools/fid_sweep.py --ckpt-dir "$SD1_DIR" \
        --reals "$ASSETS/afhq/val" --n 64 --out "$OUT/metrics.json" \
        ${INCEPTION:+--inception "$INCEPTION"} \
        ${CLIP_CKPT:+--clip "$CLIP_CKPT"}
    cat "$OUT/metrics.json"
else
    note "SKIP FID: needs SD1 ckpt + $ASSETS/afhq/val"
fi

note "artifacts in $OUT"
