"""Additional SD1 pipeline contract tests (CFG off, strength semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_sd1 import _FakeModels

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


@pytest.fixture(scope="module")
def fake_models():
    return _FakeModels()


def test_generate_without_cfg(fake_models):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import generate

    out = generate(["a"], fake_models, do_cfg=False, height=64, width=64,
                   n_inference_steps=2, seed=0)
    assert out.shape == (1, 64, 64, 3)


def test_generate_batched_prompts(fake_models):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import generate

    out = generate(["a", "b", "c"], fake_models, height=64, width=64,
                   n_inference_steps=2, seed=0)
    assert out.shape == (3, 64, 64, 3)


def test_img2img_strength_controls_steps(fake_models):
    """strength s runs ceil(s·n) steps; lower strength stays closer to the
    encoded input (less denoising applied)."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import generate

    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    low = generate(["a"], fake_models, input_images=[img], strength=0.2,
                   height=64, width=64, n_inference_steps=10, seed=3,
                   return_latents=True)
    high = generate(["a"], fake_models, input_images=[img], strength=1.0,
                    height=64, width=64, n_inference_steps=10, seed=3,
                    return_latents=True)
    # different denoise extents must give different final latents
    assert np.abs(np.asarray(low) - np.asarray(high)).max() > 1e-3


def test_train_step_deterministic_per_seed(devices8):
    """Same seed + data -> bitwise-identical loss sequence."""
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
    from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import DDPMTrainer
    from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig

    cfg = TinySDConfig(epoch=1, batch_size=8, img_size=16, T=10, channel=32,
                       dropout=0.1, dtype="fp32", warmup_epochs=1)
    images = np.random.default_rng(0).uniform(-1, 1, (8, 16, 16, 3)).astype(
        np.float32)
    labels = np.zeros(8, np.int32)

    def run():
        trainer = DDPMTrainer(cfg, mesh=build_mesh({"data": 8}, devices8))
        state = trainer.create_state(steps_per_epoch=4)
        rng = jax.random.key(7)
        out = []
        for _ in range(3):
            state, loss = trainer.train_step(state, images, labels, rng)
            out.append(float(loss))
        return out

    np.testing.assert_array_equal(run(), run())
