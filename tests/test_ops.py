"""Unit tests for embeddings, attention, norms, image ops vs torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from from_ddpm_to_stable_diffusion_tpu.ops import attention, embeddings, groupnorm, image


def test_sd1_time_embedding_matches_torch():
    for t in [0, 1, 500, 999]:
        got = np.asarray(embeddings.sd1_time_embedding(float(t)))
        freqs = np.power(10000.0, -np.arange(0, 160, dtype=np.float64) / 160)
        x = float(t) * freqs[None]
        want = np.concatenate([np.cos(x), np.sin(x)], axis=-1)
        assert got.shape == (1, 320)
        # fp32 rounding of arg≈1000 inside cos bounds the error at ~1e-4
        np.testing.assert_allclose(got, want, atol=5e-4)


def test_timestep_embedding_matches_torch():
    import math

    t = np.array([0.0, 3.5, 999.0], dtype=np.float64)
    for dim in [256, 512]:
        got = np.asarray(embeddings.timestep_embedding(jnp.asarray(t, jnp.float32), dim))
        half = dim // 2
        freqs = np.exp(-math.log(10000) * np.arange(0, half, dtype=np.float64) / half)
        args = t[:, None] * freqs[None]
        want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        assert got.shape == (3, dim)
        np.testing.assert_allclose(got, want, atol=5e-4)


def test_attention_matches_torch_sdpa():
    rng = np.random.default_rng(0)
    b, h, lq, lk, d = 2, 4, 16, 24, 32
    q = rng.standard_normal((b, h, lq, d), dtype=np.float32)
    k = rng.standard_normal((b, h, lk, d), dtype=np.float32)
    v = rng.standard_normal((b, h, lk, d), dtype=np.float32)
    got = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = F.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_causal_matches_torch():
    rng = np.random.default_rng(1)
    b, h, l, d = 2, 3, 17, 8
    q, k, v = (rng.standard_normal((b, h, l, d), dtype=np.float32) for _ in range(3))
    got = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
    want = F.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), is_causal=True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_with_bias():
    rng = np.random.default_rng(2)
    b, h, l, d = 1, 2, 9, 8
    q, k, v = (rng.standard_normal((b, h, l, d), dtype=np.float32) for _ in range(3))
    bias = rng.standard_normal((1, h, l, l), dtype=np.float32)
    got = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias=jnp.asarray(bias)))
    want = F.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        attn_mask=torch.tensor(bias)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_multi_head_attention_shapes():
    x = jnp.ones((2, 10, 64))
    out = attention.multi_head_attention(x, x, x, num_heads=8)
    assert out.shape == (2, 10, 64)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(3)
    n, h, w, c, groups = 2, 6, 5, 32, 8
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    scale = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)
    got = np.asarray(groupnorm.group_norm(
        jnp.asarray(x), groups, jnp.asarray(scale), jnp.asarray(bias)))
    xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW for torch
    want = F.group_norm(xt, groups, torch.tensor(scale), torch.tensor(bias))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_group_norm_silu_fusion():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4, 4, 8), dtype=np.float32)
    s, b = np.ones(8, np.float32), np.zeros(8, np.float32)
    plain = groupnorm.group_norm(jnp.asarray(x), 2, jnp.asarray(s), jnp.asarray(b))
    fused = groupnorm.group_norm(jnp.asarray(x), 2, jnp.asarray(s), jnp.asarray(b),
                                 act="silu")
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(jax.nn.silu(plain)), atol=1e-6)


def test_layer_norm_and_rms_norm_match_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 7, 16), dtype=np.float32)
    s = rng.standard_normal(16, dtype=np.float32)
    b = rng.standard_normal(16, dtype=np.float32)
    got = np.asarray(groupnorm.layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b)))
    want = F.layer_norm(torch.tensor(x), (16,), torch.tensor(s), torch.tensor(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)

    got_rms = np.asarray(groupnorm.rms_norm(jnp.asarray(x), jnp.asarray(s)))
    xt = torch.tensor(x)
    want_rms = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
                * torch.tensor(s)).numpy()
    np.testing.assert_allclose(got_rms, want_rms, atol=1e-5)


def test_rescale_and_uint8():
    x = jnp.asarray([[-1.0, 0.0, 1.0, 2.0]])
    y = image.rescale(x, (-1, 1), (0, 255), clamp=True)
    np.testing.assert_allclose(np.asarray(y), [[0.0, 127.5, 255.0, 255.0]])
    u = image.to_uint8(jnp.asarray([[-1.0, 1.0]]))
    assert u.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(u), [[0, 255]])


def test_upsample_nearest_matches_torch():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 5, 4), dtype=np.float32)
    got = np.asarray(image.upsample_nearest_2x(jnp.asarray(x)))
    want = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2,
                         mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_crop_pos_embed_center():
    grid = 8
    d = 4
    table = jnp.arange(grid * grid * d, dtype=jnp.float32).reshape(1, grid * grid, d)
    out = embeddings.crop_pos_embed(table, grid, 4, 4)
    assert out.shape == (1, 16, d)
    # top-left element of the crop = row 2, col 2 of the grid
    np.testing.assert_allclose(
        np.asarray(out)[0, 0], np.asarray(table).reshape(grid, grid, d)[2, 2])


def test_image_grid():
    imgs = np.arange(4 * 2 * 3 * 1).reshape(4, 2, 3, 1).astype(np.uint8)
    g = image.image_grid(imgs, nrow=2)
    assert g.shape == (4, 6, 1)
    np.testing.assert_array_equal(g[0:2, 0:3], imgs[0])
    np.testing.assert_array_equal(g[2:4, 3:6], imgs[3])


def test_dot_product_attention_segment_ids_cpu_fallback():
    """The XLA (non-flash) path must honor segment_ids identically to the
    additive-mask construction."""
    import numpy as np

    from from_ddpm_to_stable_diffusion_tpu.ops.attention import (
        _xla_attention, dot_product_attention)

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 16, 8)), jnp.float32)
               for _ in range(3))
    seg = jnp.asarray([[0] * 10 + [1] * 6], jnp.int32)
    got = dot_product_attention(q, k, v, segment_ids=(seg, seg),
                                use_flash=False)
    same = (seg[0][:, None] == seg[0][None, :])
    bias = jnp.where(same, 0.0, -1e30)[None, None]
    want = _xla_attention(q, k, v, bias, False, 8**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
