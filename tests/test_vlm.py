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

def test_vqa_dataset_grounded():
    from from_ddpm_to_stable_diffusion_tpu.io.shapes_dataset import (
        VQA_ANSWER_START, VQAShapesDataset)

    ds = VQAShapesDataset(24, img_size=32)
    seen_questions = set()
    for i in range(24):
        img, toks = ds.load(i)
        assert toks[0] == VLM_BOS
        q = " ".join(ds.vocab[t] for t in toks[1:VQA_ANSWER_START])
        seen_questions.add(q)
        ans = ds.decode_answer(toks)
        # answer must agree with the caption attributes for this index
        cap_ds = CaptionedShapesDataset(24, img_size=32)
        _, cap = cap_ds.load(i)
        words = cap_ds.decode(cap).split()  # a size color shape
        if q == "what color ?":
            assert ans == words[2], (q, ans, words)
        elif q == "what shape ?":
            assert ans == words[3]
        elif q == "what size ?":
            assert ans == words[1]
        else:
            assert ans == " ".join(words)
    assert len(seen_questions) == 4


def test_vlm_loss_masks_question_targets():
    from from_ddpm_to_stable_diffusion_tpu.io.shapes_dataset import (
        VQA_ANSWER_START)

    v = len(VLM_VOCAB)
    tokens = jnp.asarray([[1, 12, 13, 16, 6, 2, 0, 0, 0, 0]], jnp.int32)
    good = jnp.full((1, 10, v), -10.0)
    # perfect logits on the ANSWER span only; garbage on question span
    for t in range(VQA_ANSWER_START - 1, 9):
        good = good.at[0, t, int(tokens[0, t + 1])].set(10.0)
    loss_masked = vlm_loss(good, tokens, answer_start=VQA_ANSWER_START)
    loss_unmasked = vlm_loss(good, tokens)
    assert float(loss_masked) < 1e-3          # question garbage ignored
    assert float(loss_unmasked) > 1.0         # unmasked loss sees it


def test_greedy_decode_with_prompt():
    from from_ddpm_to_stable_diffusion_tpu.io.shapes_dataset import (
        VQAShapesDataset)

    model = TinyVLM(vocab_size=len(VLM_VOCAB), dim=64, depth=2, num_heads=4,
                    max_text_len=10, vision_cfg=SMALL_VISION)
    ds = VQAShapesDataset(2, img_size=32)
    imgs, toks = zip(*(ds.load(i) for i in range(2)))
    x = jnp.asarray(np.stack(imgs))
    params = model.init(jax.random.key(0), x,
                        jnp.zeros((2, 10), jnp.int32))["params"]
    prompts = np.stack(toks)[:, :4]
    ids = greedy_decode(model, params, x, max_len=10, prompt_ids=prompts)
    np.testing.assert_array_equal(np.asarray(ids)[:, :4], prompts)


@pytest.mark.slow
def test_vqa_training_learns_answers():
    """End-to-end on CPU: after training, answers depend on the QUESTION
    (same image, different question → different answer head)."""
    from from_ddpm_to_stable_diffusion_tpu.io import DataLoader
    from from_ddpm_to_stable_diffusion_tpu.io.shapes_dataset import (
        VQA_ANSWER_START, VQAShapesDataset)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.vlm_trainer import (
        VLMTrainer)

    model = TinyVLM(vocab_size=len(VLM_VOCAB), dim=64, depth=2, num_heads=4,
                    max_text_len=10, vision_cfg=SMALL_VISION)
    ds = VQAShapesDataset(96, img_size=32)
    loader = DataLoader(ds, 16)
    trainer = VLMTrainer(model, lr=1e-3, warmup_steps=10, total_steps=200,
                         answer_start=VQA_ANSWER_START)
    state = trainer.create_state(32)
    first = last = None
    for _ in range(6):
        for images, tokens in loader:
            state, loss = trainer.train_step(state, images, tokens)
            if first is None:
                first = float(loss)
            last = float(loss)
    assert last < first * 0.6, (first, last)
    # train-set answer accuracy should be well above the ~1/7 word chance
    acc = trainer.qa_accuracy(state, ds, n=32)
    assert acc > 0.3, acc
