"""W8A8 int8 serving path: quantization math, QuantDense ≡ Dense within
quantization tolerance, MMDiT int8_mm end-to-end closeness.

Scheme rationale + on-chip speedups: ops/quantize.py docstring,
tools/probe_int8.py (1.4-1.5x over bf16 on MMDiT-shaped matmuls).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from from_ddpm_to_stable_diffusion_tpu.ops.quantize import (
    QuantDense, int8_dot, quantize_per_channel, quantize_tree)


def test_quantize_per_channel_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 48)) \
        * jnp.logspace(-2, 1, 48)  # wild per-channel spread
    q, s = quantize_per_channel(w, axis=0)
    assert q.dtype == jnp.int8 and s.shape == (48,)
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
    back = q.astype(jnp.float32) * s
    # per-channel scales absorb the spread: max error ≤ scale/2 per channel
    err = jnp.max(jnp.abs(back - w), axis=0)
    assert bool(jnp.all(err <= s * 0.5 + 1e-7))


def test_int8_dot_accuracy():
    kx, kw = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (4, 96, 256))
    w = jax.random.normal(kw, (256, 128)) / 16.0
    q, s = quantize_per_channel(w, axis=0)
    got = int8_dot(x, q, s)
    want = x @ w
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel   # ~0.5% typical for gaussian W8A8


def test_int8_dot_never_overflows_symmetric_range():
    # adversarial activation: one huge outlier per row still yields |q|<=127
    x = jnp.full((2, 8, 32), 1e-3).at[:, :, 0].set(1e4)
    w = jnp.eye(32)
    q, s = quantize_per_channel(w, axis=0)
    out = int8_dot(x, q, s)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out[:, :, 0]), 1e4, rtol=1e-2)


def test_quant_dense_matches_dense_within_tolerance():
    dense = nn.Dense(64)
    x = jax.random.normal(jax.random.key(2), (3, 40, 96))
    params = dense.init(jax.random.key(3), x)["params"]
    want = dense.apply({"params": params}, x)

    qparams = quantize_tree({"kernel": params["kernel"],
                             "bias": params["bias"]},
                            targets=__import__("re").compile("kernel$"))
    qd = QuantDense(64, dtype=jnp.float32)
    got = qd.apply({"params": qparams}, x)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_quantize_tree_targets_and_passthrough():
    params = {
        "joint_block0": {"qkv": {"kernel": jnp.ones((8, 24)),
                                 "bias": jnp.zeros(24)},
                         "adaLN": {"kernel": jnp.ones((8, 48)),
                                   "bias": jnp.zeros(48)}},
        "final_linear": {"kernel": jnp.ones((8, 4)), "bias": jnp.zeros(4)},
    }
    out = quantize_tree(params)
    # targeted: qkv → {q, scale, bias}
    assert set(out["joint_block0"]["qkv"]) == {"q", "scale", "bias"}
    assert out["joint_block0"]["qkv"]["q"].dtype == jnp.int8
    # untargeted: adaLN + final_linear keep their fp kernels
    assert "kernel" in out["joint_block0"]["adaLN"]
    assert "kernel" in out["final_linear"]


def test_mmdit_int8_mm_close_to_bf16():
    """Full tiny MMDiT: the int8 path's params come from quantize_tree of
    the bf16 tree; outputs must agree closely (serving-quality bar)."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=2, in_channels=4, adm_in_channels=8,
                      context_dim=16, pos_embed_max_size=16)
    model = MMDiT(cfg, dtype=jnp.float32)
    qmodel = MMDiT(
        __import__("dataclasses").replace(cfg, int8_mm=True),
        dtype=jnp.float32)
    kx, kt, ky, kc, ki = jax.random.split(jax.random.key(4), 5)
    x = jax.random.normal(kx, (2, 8, 8, 4))
    t = jnp.asarray([1.0, 500.0])
    y = jax.random.normal(ky, (2, 8))
    ctx = jax.random.normal(kc, (2, 6, 16))
    params = model.init(ki, x, t, y, ctx)["params"]
    want = model.apply({"params": params}, x, t, y, ctx)

    qparams = quantize_tree(params)
    got = qmodel.apply({"params": qparams}, x, t, y, ctx)
    assert got.shape == want.shape
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.05, rel
    # and the quantized tree actually stores int8 for the hot kernels
    assert qparams["joint_block0"]["x_block"]["qkv"]["q"].dtype == jnp.int8
    assert qparams["joint_block0"]["x_block"]["mlp_fc1"]["q"].dtype \
        == jnp.int8


def test_t5_int8_close_to_fp():
    import dataclasses

    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        T5Config, T5Encoder)

    cfg = T5Config(vocab_size=64, d_model=32, d_ff=64, num_layers=2,
                   num_heads=4)
    enc = T5Encoder(cfg, dtype=jnp.float32)
    qenc = T5Encoder(dataclasses.replace(cfg, int8_mm=True),
                     dtype=jnp.float32)
    toks = jnp.arange(12, dtype=jnp.int32)[None] % 64
    params = enc.init(jax.random.key(6), toks)["params"]
    want = enc.apply({"params": params}, toks)
    qparams = quantize_tree(params)
    got = qenc.apply({"params": qparams}, toks)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.05, rel
    # q/k/v/o + wi_0/wi_1/wo all quantized; rel-bias + embeddings untouched
    blk = qparams["block0"]
    assert blk["attn"]["q"]["q"].dtype == jnp.int8
    assert blk["wo"]["q"].dtype == jnp.int8
    assert "embedding" in qparams["embed_tokens"]


def test_sd3_models_quantize_int8_end_to_end():
    """SD3Models.quantize_int8 keeps the whole prompt→image path working
    (tiny op point) and converts the hot kernels in place."""
    from from_ddpm_to_stable_diffusion_tpu.models.text_encoders import (
        CLIPTextConfig, T5Config)
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd3 import (
        SD3Inferencer, SD3Models)

    models = SD3Models.initialize(
        jax.random.key(7), dtype="fp32", depth=2, pos_embed_max_size=16,
        clip_l_cfg=CLIPTextConfig(vocab_size=64, hidden_size=768,
                                  num_layers=2, num_heads=4),
        clip_g_cfg=CLIPTextConfig(vocab_size=64, hidden_size=1280,
                                  num_layers=2, num_heads=4,
                                  hidden_act="gelu"),
        t5_config=T5Config(vocab_size=64, d_model=4096, d_ff=64,
                           num_layers=1, num_heads=4))
    models.quantize_int8()
    assert models.mmdit.config.int8_mm and models.t5.config.int8_mm
    q = models.params["mmdit"]["joint_block0"]["x_block"]["qkv"]["q"]
    assert q.dtype == jnp.int8

    inf = SD3Inferencer(models)
    ids = np.zeros((1, 77), np.int32)
    ctx, pooled = inf.get_cond(jnp.asarray(ids), jnp.asarray(ids),
                               clip_g_tokens=jnp.asarray(ids))
    latent = jnp.zeros((1, 8, 8, 16))
    out = inf.denoise(latent, ctx, pooled, ctx, pooled, steps=2, seed=3)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sd1_unet_int8_close_to_fp():
    """SD1 UNet with int8 attention/GEGLU projections stays close to the
    fp path; convs/time_proj keep fp kernels."""
    from from_ddpm_to_stable_diffusion_tpu.models.sd1 import SD1UNet

    unet = SD1UNet(model_channels=32, num_heads=2, dtype=jnp.float32)
    qunet = SD1UNet(model_channels=32, num_heads=2, dtype=jnp.float32,
                    int8_mm=True)
    kx, kc, kt, ki = jax.random.split(jax.random.key(8), 4)
    x = jax.random.normal(kx, (1, 16, 16, 4))
    ctx = jax.random.normal(kc, (1, 77, 768))
    tf = jax.random.normal(kt, (1, 320))
    params = unet.init(ki, x, ctx, tf)["params"]
    want = unet.apply({"params": params}, x, ctx, tf)
    qparams = quantize_tree(params)
    got = qunet.apply({"params": qparams}, x, ctx, tf)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.05, rel

    flat = jax.tree_util.tree_flatten_with_path(qparams)[0]
    paths = {"/".join(str(getattr(k, "key", k)) for k in kp): v
             for kp, v in flat}
    assert any(p.endswith("attn1/qkv/q") for p in paths)
    assert any(p.endswith("geglu_in/q") for p in paths)
    # time_proj + convs untouched
    assert all(v.dtype != jnp.int8 for p, v in paths.items()
               if "time_proj" in p or "conv" in p)


def test_sd1_generator_int8_pipeline():
    """quantize_int8 + SD1Generator: the whole prompt→image path runs."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import (SD1Generator,
                                                                 SD1Models)
    from tests.test_sd1 import _FakeModels

    models = _FakeModels()
    SD1Models.quantize_int8(models)  # duck-typed bundle, real method
    assert models.unet.int8_mm
    gen = SD1Generator(models, sampler="k_euler", n_inference_steps=2,
                       height=64, width=64)
    img = gen(["p"], seed=5)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8


def test_int8_tp_sharded_mmdit_matches_single_device():
    """--int8 composes with --tp: the quantized {q, scale} layout gets the
    kernel's TP specs (parallel/sharding.py) and stays exact — including
    row-parallel int8_dot, whose per-token abs-max spans the sharded K
    axis (GSPMD all-reduces it)."""
    import jax.numpy as jnp

    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)
    from from_ddpm_to_stable_diffusion_tpu.parallel import build_mesh
    from from_ddpm_to_stable_diffusion_tpu.parallel.sharding import (
        tp_shardings, tp_spec_for_path)

    cfg = MMDiTConfig(depth=2, pos_embed_max_size=8, int8_mm=True)
    model = MMDiT(cfg)
    base = MMDiT(__import__("dataclasses").replace(cfg, int8_mm=False))
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    t = jnp.asarray([100.0, 500.0])
    y = jax.random.normal(jax.random.key(1), (2, 2048))
    ctx = jax.random.normal(jax.random.key(2), (2, 154, 4096))
    params = quantize_tree(base.init(jax.random.key(3), x, t, y, ctx)
                           ["params"])
    want = model.apply({"params": params}, x, t, y, ctx)

    # the quantized leaves actually get TP specs (not silent replication)
    from jax.sharding import PartitionSpec as P
    assert tp_spec_for_path("joint_block0/x_block/qkv/q") == P(None, "model")
    assert tp_spec_for_path("joint_block0/x_block/qkv/scale") == P("model")
    assert tp_spec_for_path("joint_block0/x_block/proj/q") == P("model",
                                                                None)
    assert tp_spec_for_path("joint_block0/x_block/proj/scale") == P()
    # norm scales must NOT be sharded by the quant rules
    assert tp_spec_for_path("joint_block0/x_block/ln_q/scale") == P()

    mesh = build_mesh({"data": 2, "model": 4}, jax.devices()[:8])
    sharded = jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh))
    from jax.sharding import NamedSharding
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, x: model.apply({"params": p}, x, t, y, ctx))(
        sharded, xs)
    # int8_dot itself is exact under both shardings (isolated check below);
    # at the model level, fp-reassociation differences (~1e-6) in upstream
    # activations can flip round(x/xs) grid cells, so sharded-vs-single
    # outputs differ by up to a few quantization steps — bound accordingly.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())
    assert corr[0, 1] > 0.9999


def test_int8_dot_exact_under_tp_shardings():
    """The op itself is bit-stable under row- and column-parallel layouts
    (GSPMD all-reduces the per-token abs-max and the int32 partials)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((4, 64, 128)), jnp.float32)
    w = jnp.asarray(r.standard_normal((128, 96)), jnp.float32) / 8
    q, s = quantize_per_channel(w, axis=0)
    want = int8_dot(x, q, s)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("model",))
    # row-parallel: x and q sharded on K, scale replicated
    got_row = jax.jit(int8_dot)(
        jax.device_put(x, NamedSharding(mesh, P(None, None, "model"))),
        jax.device_put(q, NamedSharding(mesh, P("model", None))),
        jax.device_put(s, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(got_row), np.asarray(want),
                               atol=1e-5)
    # column-parallel: q/scale sharded on N, x replicated
    got_col = jax.jit(int8_dot)(
        x, jax.device_put(q, NamedSharding(mesh, P(None, "model"))),
        jax.device_put(s, NamedSharding(mesh, P("model"))))
    np.testing.assert_allclose(np.asarray(got_col), np.asarray(want),
                               atol=1e-5)


def test_quantized_params_init_shapes_match_converter():
    """qmodel.init's placeholder tree and quantize_tree's output must have
    identical structure/shapes/dtypes — the contract that lets converted
    params apply through the int8 module tree."""
    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=2, in_channels=4, adm_in_channels=8,
                      context_dim=16, pos_embed_max_size=16)
    model = MMDiT(cfg, dtype=jnp.float32)
    qmodel = MMDiT(
        __import__("dataclasses").replace(cfg, int8_mm=True),
        dtype=jnp.float32)
    kx = jax.random.key(5)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    y = jnp.zeros((1, 8))
    ctx = jnp.zeros((1, 6, 16))
    params = model.init(kx, x, t, y, ctx)["params"]
    qinit = qmodel.init(kx, x, t, y, ctx)["params"]
    qconv = quantize_tree(params)
    si = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), qinit)
    sc = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), qconv)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_equal(si, sc)


def test_quantize_skips_moe_router_and_experts():
    """int8_mm composes with moe_experts: projection kernels quantize, the
    MoE router kernel (fp32 top-1 decisions) and 3-D expert tensors do
    NOT, and the combined model applies."""
    import dataclasses

    from from_ddpm_to_stable_diffusion_tpu.models.mmdit import (MMDiT,
                                                                MMDiTConfig)

    cfg = MMDiTConfig(depth=2, in_channels=4, adm_in_channels=8,
                      context_dim=16, pos_embed_max_size=8,
                      moe_experts=4, int8_mm=True)
    base = MMDiT(dataclasses.replace(cfg, int8_mm=False))
    model = MMDiT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    t = jnp.asarray([1.0, 500.0])
    y = jax.random.normal(jax.random.key(1), (2, 8))
    ctx = jax.random.normal(jax.random.key(2), (2, 6, 16))
    params = base.init(jax.random.key(3), x, t, y, ctx)["params"]
    q = quantize_tree(params)
    moe = q["joint_block0"]["x_block"]["moe"]
    assert "kernel" in moe["router"]           # router NOT quantized
    assert moe["router"]["kernel"].dtype != jnp.int8
    assert moe["wi"].ndim == 3                 # experts untouched
    assert q["joint_block0"]["x_block"]["qkv"]["q"].dtype == jnp.int8
    out = model.apply({"params": q}, x, t, y, ctx)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
