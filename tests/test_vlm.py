"""TinyVLM (stage 07⁺): dataset grounding, model shapes, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.io.shapes_dataset import (
    VLM_BOS, VLM_EOS, VLM_VOCAB, CaptionedShapesDataset)
from from_ddpm_to_stable_diffusion_tpu.models.siglip import (
    SiglipVisionConfig)
from from_ddpm_to_stable_diffusion_tpu.models.tiny_vlm import (
    TinyVLM, greedy_decode, vlm_loss)

SMALL_VISION = SiglipVisionConfig(hidden_size=64, intermediate_size=128,
                                  num_hidden_layers=2,
                                  num_attention_heads=4, image_size=32,
                                  patch_size=8)


def _small_model():
    return TinyVLM(vocab_size=len(VLM_VOCAB), dim=64, depth=2, num_heads=4,
                   vision_cfg=SMALL_VISION)


def test_captioned_dataset_deterministic_and_grounded():
    ds = CaptionedShapesDataset(12, img_size=32)
    img1, cap1 = ds.load(3)
    img2, cap2 = ds.load(3)
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(cap1, cap2)
    assert img1.shape == (32, 32, 3)
    assert cap1[0] == VLM_BOS and VLM_EOS in cap1
    text = ds.decode(cap1)
    words = text.split()
    assert words[0] == "a" and words[1] in ("small", "big")
    assert words[2] in ("red", "green", "blue")
    assert words[3] in ("circle", "square", "triangle")
    # caption color is actually in the image: dominant bright channel
    shape_pixels = img1[img1.max(axis=-1) > -0.5]
    dom = ["red", "green", "blue"][int(np.argmax(shape_pixels.mean(0)))]
    assert dom == words[2], (dom, text)


def test_vlm_forward_and_loss():
    model = _small_model()
    ds = CaptionedShapesDataset(4, img_size=32)
    imgs, caps = zip(*(ds.load(i) for i in range(4)))
    x = jnp.asarray(np.stack(imgs))
    t = jnp.asarray(np.stack(caps))
    params = model.init(jax.random.key(0), x, t)["params"]
    logits = model.apply({"params": params}, x, t)
    assert logits.shape == (4, 8, len(VLM_VOCAB))
    loss = vlm_loss(logits, t)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_greedy_decode_fixed_shape():
    model = _small_model()
    ds = CaptionedShapesDataset(2, img_size=32)
    imgs, _ = zip(*(ds.load(i) for i in range(2)))
    x = jnp.asarray(np.stack(imgs))
    params = model.init(jax.random.key(0), x,
                        jnp.zeros((2, 8), jnp.int32))["params"]
    ids = greedy_decode(model, params, x, max_len=8)
    assert ids.shape == (2, 8) and ids.dtype == jnp.int32
    assert (np.asarray(ids)[:, 0] == VLM_BOS).all()
    assert (np.asarray(ids) >= 0).all()
    assert (np.asarray(ids) < len(VLM_VOCAB)).all()


@pytest.mark.slow
def test_vlm_training_reduces_loss():
    from from_ddpm_to_stable_diffusion_tpu.io import DataLoader
    from from_ddpm_to_stable_diffusion_tpu.pipelines.vlm_trainer import (
        VLMTrainer)

    ds = CaptionedShapesDataset(64, img_size=32)
    loader = DataLoader(ds, 16)
    trainer = VLMTrainer(_small_model(), lr=1e-3, warmup_steps=5,
                         total_steps=120)
    state = trainer.create_state(32)
    first = last = None
    for epoch in range(8):
        for images, tokens in loader:
            state, loss = trainer.train_step(state, images, tokens)
            if first is None:
                first = float(loss)
            last = float(loss)
    assert last < first * 0.6, (first, last)


@pytest.mark.slow
def test_vlm_cli_train_smoke(tmp_path):
    from from_ddpm_to_stable_diffusion_tpu.cli.multimodal import main

    out = tmp_path / "grid.png"
    rc = main(["train", "--epochs", "1", "--examples", "32",
               "--batch-size", "16", "--img-size", "32", "--dim", "64",
               "--depth", "2", "--dtype", "fp32", "--out", str(out)])
    assert rc == 0