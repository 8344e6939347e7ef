"""Generation-quality metrics: Fréchet distance (FID-style) and CLIP score.

BASELINE.md names FID / CLIP-score parity as the quality contract. The
classic FID featurizer (InceptionV3 pool3) requires downloaded weights;
offline, the framework's own CLIP vision tower serves as the featurizer
(CLIP-FID — a standard variant) through the same Fréchet machinery, and the
InceptionV3 features can be dropped in when weights are available: the
statistics/distance math below is featurizer-agnostic.

With a pretrained ViT-L/14 checkpoint, ``io.weights_clip.
import_openai_clip`` supplies (params, cfg) for the REAL CLIP-score /
CLIP-FID: build ``models.clip.CLIP(**cfg)``, preprocess images with
``ops.image.clip_preprocess``, tokenize with the SD1 ``CLIPTokenizer``
(same BPE vocab), and pass both to :func:`clip_score` / :func:`clip_fid`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def feature_statistics(features: jax.Array):
    """(N, D) features -> (mu (D,), cov (D, D)) in float64-ish fp32."""
    f = jnp.asarray(features, jnp.float32)
    mu = jnp.mean(f, axis=0)
    centered = f - mu
    cov = centered.T @ centered / (f.shape[0] - 1)
    return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """FID = |μ₁−μ₂|² + tr(Σ₁ + Σ₂ − 2·(Σ₁^{1/2} Σ₂ Σ₁^{1/2})^{1/2}).

    The matrix square roots use symmetric eigendecompositions (jnp.eigh),
    clamping tiny negative eigenvalues from numerical noise.
    """
    mu1, cov1, mu2, cov2 = (jnp.asarray(a, jnp.float32)
                            for a in (mu1, cov1, mu2, cov2))

    def sqrtm_psd(m):
        w, v = jnp.linalg.eigh(m)
        w = jnp.maximum(w, 0.0)
        return (v * jnp.sqrt(w)[None, :]) @ v.T

    s1 = sqrtm_psd(cov1 + eps * jnp.eye(cov1.shape[0]))
    inner = s1 @ cov2 @ s1
    s_inner = sqrtm_psd((inner + inner.T) / 2.0)
    diff = mu1 - mu2
    fid = (jnp.dot(diff, diff) + jnp.trace(cov1) + jnp.trace(cov2)
           - 2.0 * jnp.trace(s_inner))
    return float(fid)


def fid_from_features(feats_a, feats_b) -> float:
    mu1, c1 = feature_statistics(feats_a)
    mu2, c2 = feature_statistics(feats_b)
    return frechet_distance(mu1, c1, mu2, c2)


def clip_image_features(images, clip_model, params,
                        batch_size: int = 32) -> np.ndarray:
    """Normalized image features from the framework's CLIP vision tower.

    images: (N, H, W, 3) float in [−1, 1] at the tower's resolution.
    """
    feats = []
    apply = jax.jit(lambda p, x: clip_model.apply(
        {"params": p}, x, method=type(clip_model).encode_image))
    for s in range(0, len(images), batch_size):
        f = apply(params, jnp.asarray(images[s:s + batch_size]))
        f = f / jnp.linalg.norm(f.astype(jnp.float32), axis=1, keepdims=True)
        feats.append(np.asarray(f))
    return np.concatenate(feats)


def clip_fid(images_a, images_b, clip_model, params) -> float:
    """Fréchet distance in the CLIP vision tower's feature space."""
    return fid_from_features(
        clip_image_features(images_a, clip_model, params),
        clip_image_features(images_b, clip_model, params))


def clip_score(images, token_ids, clip_model, params) -> float:
    """Mean 100·cos(image, caption) over matched pairs (CLIPScore)."""
    img = clip_model.apply({"params": params}, jnp.asarray(images),
                           method=type(clip_model).encode_image)
    txt = clip_model.apply({"params": params}, jnp.asarray(token_ids),
                           method=type(clip_model).encode_text)
    img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=1, keepdims=True)
    return float(100.0 * jnp.mean(jnp.sum(img * txt, axis=1)))


def inception_features(images, params, batch_size: int = 32) -> np.ndarray:
    """Canonical FID features: pool3 of the FID InceptionV3.

    images: (N, H, W, 3) float in [0, 1] (any resolution — bilinear-resized
    to 299² like pytorch-fid); params from
    ``io.weights_inception.import_inception_fid``.
    """
    from ..models.inception import InceptionV3FID, resize_for_fid

    model = InceptionV3FID()
    apply = jax.jit(lambda p, x: model.apply({"params": p},
                                             resize_for_fid(x)))
    feats = []
    for s in range(0, len(images), batch_size):
        feats.append(np.asarray(apply(params,
                                      jnp.asarray(images[s:s + batch_size]))))
    return np.concatenate(feats)


def inception_fid(images_a, images_b, params) -> float:
    """Canonical FID (InceptionV3 pool3 Fréchet distance); images in
    [0, 1].  CLIP-FID (:func:`clip_fid`) remains the weights-free
    fallback."""
    return fid_from_features(inception_features(images_a, params),
                             inception_features(images_b, params))


def kid_from_features(feats_a, feats_b, n_subsets: int = 10,
                      subset_size: Optional[int] = None,
                      seed: int = 0) -> float:
    """Kernel Inception Distance: unbiased MMD² with the polynomial kernel
    k(x, y) = (xᵀy/d + 1)³ (Bińkowski et al. 2018), averaged over random
    subsets. Unlike FID it is unbiased at small sample counts — the right
    metric for the few-hundred-image eval runs this environment allows.
    Works with ANY featurizer (inception_features / clip_image_features).
    """
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    d = a.shape[1]
    # clamp to the available rows; the unbiased estimator needs m >= 2
    m = min(subset_size or 1000, len(a), len(b))
    if m < 2:
        raise ValueError(f"KID needs >= 2 samples per side, got m={m}")
    rng = np.random.default_rng(seed)

    def poly(x, y):
        return (x @ y.T / d + 1.0) ** 3

    vals = []
    for _ in range(n_subsets):
        xa = a[rng.choice(len(a), m, replace=False)]
        xb = b[rng.choice(len(b), m, replace=False)]
        kaa = poly(xa, xa)
        kbb = poly(xb, xb)
        kab = poly(xa, xb)
        # unbiased MMD²: drop the diagonals of the within-set terms
        term_a = (kaa.sum() - np.trace(kaa)) / (m * (m - 1))
        term_b = (kbb.sum() - np.trace(kbb)) / (m * (m - 1))
        vals.append(term_a + term_b - 2.0 * kab.mean())
    return float(np.mean(vals))
