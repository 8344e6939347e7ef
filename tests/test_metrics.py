"""FID / CLIP-score harness tests (math verified analytically)."""

import jax
import jax.numpy as jnp
import numpy as np

from from_ddpm_to_stable_diffusion_tpu.utils import metrics
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full models/pipelines


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((500, 16)).astype(np.float32)
    assert abs(metrics.fid_from_features(f, f)) < 1e-2


def test_frechet_mean_shift_analytic():
    """FID between N(0, I) and N(m, I) = |m|² (analytic)."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((20000, 8)).astype(np.float32)
    shift = np.full(8, 0.5, np.float32)
    b = rng.standard_normal((20000, 8)).astype(np.float32) + shift
    fid = metrics.fid_from_features(a, b)
    want = float(np.dot(shift, shift))  # 2.0
    assert abs(fid - want) < 0.15


def test_frechet_scale_sensitivity():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((20000, 4)).astype(np.float32)
    b = 2.0 * rng.standard_normal((20000, 4)).astype(np.float32)
    # analytic: tr(I) + tr(4I) - 2 tr(sqrt(4 I)) = 4 + 16 - 16 = ... per-dim
    # (1 + 4 - 2*2) = 1 -> total 4
    fid = metrics.fid_from_features(a, b)
    assert abs(fid - 4.0) < 0.3


def test_clip_fid_and_score_run():
    from from_ddpm_to_stable_diffusion_tpu.models.clip import CLIP

    model = CLIP(embed_dim=16, image_resolution=16, vision_layers=1,
                 vision_width=32, vision_patch_size=8, context_length=8,
                 vocab_size=32, transformer_width=32, transformer_heads=4,
                 transformer_layers=1)
    img = jnp.zeros((2, 16, 16, 3))
    txt = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), img, txt)["params"]

    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    fid_ab = metrics.clip_fid(a, b, model, params)
    fid_aa = metrics.clip_fid(a, a, model, params)
    assert np.isfinite(fid_ab) and fid_ab >= 0
    assert fid_aa < 1e-2

    tokens = rng.integers(1, 31, (8, 8)).astype(np.int32)
    score = metrics.clip_score(a, tokens, model, params)
    assert -100.0 <= score <= 100.0


@pytest.mark.slow
def test_clip_score_orders_matched_above_shuffled():
    """CLIP-score becomes a MEANINGFUL metric check: after memorizing a
    small matched set contrastively, matched pairs must outscore a
    shuffled pairing (the property FID/CLIP-score evaluation relies on)."""
    import jax

    from from_ddpm_to_stable_diffusion_tpu.models.clip import CLIP
    from from_ddpm_to_stable_diffusion_tpu.pipelines.clip_trainer import (
        CLIPTrainer)
    from from_ddpm_to_stable_diffusion_tpu.utils.metrics import clip_score

    model = CLIP(embed_dim=16, image_resolution=16, vision_layers=1,
                 vision_width=32, vision_patch_size=8, context_length=8,
                 vocab_size=32, transformer_width=32, transformer_heads=4,
                 transformer_layers=1)
    trainer = CLIPTrainer(model, lr=3e-3)
    state = trainer.create_state((16, 16, 3), 8)
    rng = np.random.default_rng(1)
    images = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    tokens = rng.integers(1, 31, (8, 8)).astype(np.int32)
    for _ in range(30):
        state, _ = trainer.train_step(state, images, tokens)
    params = jax.device_get(state.params)
    matched = clip_score(images, tokens, model, params)
    shuffled = clip_score(images, np.roll(tokens, 3, axis=0), model, params)
    assert matched > shuffled + 5.0, (matched, shuffled)


def test_kid_identity_and_separation():
    """KID (unbiased MMD², cubic kernel): ~0 for same-distribution splits,
    clearly positive for shifted distributions, and near-unbiased at small
    subset sizes (where FID's bias dominates)."""
    from from_ddpm_to_stable_diffusion_tpu.utils.metrics import (
        kid_from_features)

    r = np.random.default_rng(0)
    a = r.standard_normal((400, 64))
    a2 = r.standard_normal((400, 64))
    b = r.standard_normal((400, 64)) + 0.75

    same = kid_from_features(a, a2, subset_size=100)
    diff = kid_from_features(a, b, subset_size=100)
    assert abs(same) < 0.02
    assert diff > 10 * max(abs(same), 1e-6)
    # small-sample behavior: estimate at m=50 within noise of m=200
    small = kid_from_features(a, b, subset_size=50, n_subsets=20)
    big = kid_from_features(a, b, subset_size=200, n_subsets=20)
    np.testing.assert_allclose(small, big, rtol=0.25)
