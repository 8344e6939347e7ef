"""ViT / CLIP / SigLIP tests (shape contracts + training smoke + losses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.models.clip import (
    CLIP, clip_contrastive_loss, siglip_loss)
from from_ddpm_to_stable_diffusion_tpu.models.siglip import (
    SiglipVisionConfig, SiglipVisionModel)
from from_ddpm_to_stable_diffusion_tpu.models.vit import ViT

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def test_vit_shapes():
    model = ViT(image_size=32, patch_size=8, num_classes=3, dim=64, depth=2,
                heads=4, mlp_dim=128)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 3)


def test_vit_train_smoke(devices8):
    from from_ddpm_to_stable_diffusion_tpu.io import DataLoader, SyntheticImageDataset
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
    from from_ddpm_to_stable_diffusion_tpu.pipelines.vit_trainer import ViTTrainer
    from from_ddpm_to_stable_diffusion_tpu.utils.config import ViTTrainConfig

    cfg = ViTTrainConfig(epoch=3, batch_size=8, img_size=16, patch_size=8,
                         dim=32, depth=1, heads=4, mlp_dim=64, num_class=3,
                         dropout=0.0, emb_dropout=0.0, lr=3e-3, dtype="fp32")
    trainer = ViTTrainer(cfg, mesh=build_mesh({"data": 8}, devices8))
    ds = SyntheticImageDataset(n=32, img_size=16, num_classes=3)
    loader = DataLoader(ds, batch_size=8, shuffle=False)
    state = trainer.fit(loader, epochs=3)
    acc = trainer.evaluate(state, loader)
    # synthetic labels are deterministic per-index; memorization should beat chance
    assert acc > 0.4


@pytest.fixture(scope="module")
def tiny_clip():
    model = CLIP(embed_dim=32, image_resolution=32, vision_layers=2,
                 vision_width=64, vision_patch_size=8, context_length=16,
                 vocab_size=100, transformer_width=32, transformer_heads=4,
                 transformer_layers=2)
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.zeros((2, 16), jnp.int32)
    params = model.init(jax.random.key(0), img, txt)
    return model, params


def test_clip_forward_shapes(tiny_clip):
    model, params = tiny_clip
    img = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    txt = jnp.asarray([[1, 5, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                       [1, 7, 8, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    li, lt = model.apply(params, img, txt)
    assert li.shape == (2, 2) and lt.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-5)


def test_clip_encoders(tiny_clip):
    model, params = tiny_clip
    img_feat = model.apply(params, jnp.zeros((2, 32, 32, 3)),
                           method=CLIP.encode_image)
    txt_feat = model.apply(params,
                           jnp.asarray([[1, 5, 99] + [0] * 13]),
                           method=CLIP.encode_text)
    assert img_feat.shape == (2, 32)
    assert txt_feat.shape == (1, 32)


def test_clip_contrastive_loss_prefers_diagonal():
    good = 10.0 * jnp.eye(4)
    bad = jnp.zeros((4, 4))
    assert float(clip_contrastive_loss(good)) < float(clip_contrastive_loss(bad))


def test_siglip_loss_prefers_matched_pairs():
    rng = jax.random.PRNGKey(0)
    f = jax.random.normal(rng, (4, 8))
    matched = siglip_loss(f, f, temperature=10.0, bias=-10.0)
    mismatched = siglip_loss(f, jnp.roll(f, 1, axis=0), temperature=10.0,
                             bias=-10.0)
    assert float(matched) < float(mismatched)


def test_siglip_vision_shapes():
    cfg = SiglipVisionConfig(hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=32, patch_size=8)
    model = SiglipVisionModel(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 16, 64)  # (32/8)² = 16 patches, no class token
