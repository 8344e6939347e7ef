"""Tensor-parallel SD1 serving: TP-sharded generator ≡ single-device.

The full 860M UNet runs over the fake 8-device CPU mesh with the model
axis sharding attention/GEGLU kernels (parallel/sharding.py rules);
GSPMD inserts the all-reduces. Output must match the unsharded pipeline
to fp32 tolerance.
"""

import jax
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (SD1Generator,
                                                             SD1Models)

pytestmark = pytest.mark.slow


def test_sd1_generator_tp_matches_single_device():
    models = SD1Models.initialize(jax.random.key(0), dtype="fp32",
                                  height=64, width=64)
    ref_gen = SD1Generator(models, n_inference_steps=2,
                           height=64, width=64)
    ref = ref_gen(["x"], seed=7)

    tp_models = SD1Models(models.clip, models.unet, models.encoder,
                          models.decoder, dict(models.params))
    # 2-device mesh: replicated conv params are copied per device, so an
    # 8-device mesh would hold 8x the 3.4GB fp32 UNet on host RAM (OOM)
    mesh = build_mesh({"model": 2}, jax.devices()[:2])
    tp_gen = SD1Generator(tp_models, n_inference_steps=2,
                          height=64, width=64, mesh=mesh)
    got = tp_gen(["x"], seed=7)

    assert got.shape == ref.shape == (1, 64, 64, 3)
    # uint8 outputs; allow off-by-one from fp reassociation in the psum
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"


def test_tp_specs_cover_sd1_unet():
    """The TP rules must actually shard the SD1 UNet's hot kernels."""
    from from_ddpm_to_stable_diffusion_tpu.parallel.sharding import (
        tp_spec_for_path)

    assert tuple(tp_spec_for_path("enc1_att/attn1/qkv/kernel")) == \
        (None, "model")
    assert tuple(tp_spec_for_path("enc1_att/attn1/out/kernel")) == \
        ("model", None)
    assert tuple(tp_spec_for_path("enc1_att/geglu_in/kernel")) == \
        (None, "model")
    assert tuple(tp_spec_for_path("enc1_att/geglu_out/kernel")) == \
        ("model", None)
    assert tuple(tp_spec_for_path("enc1_res/conv1/kernel")) == ()
