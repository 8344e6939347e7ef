"""InceptionV3 FID featurizer: mapping completeness + torch-oracle parity
for the BatchNorm folding and the FID pooling quirks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from from_ddpm_to_stable_diffusion_tpu.io import weights_inception as WI
from from_ddpm_to_stable_diffusion_tpu.models.inception import (
    InceptionA, InceptionE, InceptionV3FID)
from tests.test_weights import _invert, _tree_paths

pytestmark = pytest.mark.slow


def test_inception_mapping_roundtrip():
    model = InceptionV3FID()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.key(0), x)["params"]
    flax_shapes = _tree_paths(jax.tree_util.tree_map(np.asarray, params))
    rules = WI.inception_fid_rules()
    state = _invert(rules, flax_shapes)
    imported = WI.apply_rules(state, rules)
    got = _tree_paths(imported)
    assert got == flax_shapes, (
        f"missing: {sorted(set(flax_shapes) - set(got))[:6]} "
        f"extra: {sorted(set(got) - set(flax_shapes))[:6]}")
    feats = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported)}, x)
    assert feats.shape == (1, 2048)


class _TorchBasicConv(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _randomize_bn(module, seed):
    rng = np.random.default_rng(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            c = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rng.standard_normal(c).astype(np.float32) * 0.5))
            m.running_var.copy_(torch.from_numpy(
                rng.random(c).astype(np.float32) + 0.5))
            m.weight.data.copy_(torch.from_numpy(
                rng.standard_normal(c).astype(np.float32) * 0.3 + 1.0))
            m.bias.data.copy_(torch.from_numpy(
                rng.standard_normal(c).astype(np.float32) * 0.3))


def _import_block(tm, prefix, flax_paths):
    """torch module state dict → fold BN → rules for the given paths."""
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    from from_ddpm_to_stable_diffusion_tpu.io.weights import (apply_rules,
                                                              t_conv, t_none)

    rules = []
    for path in flax_paths:
        kp = f"{path}." if path else ""
        f = path.replace(".", "/")
        rules += [(f"{kp}conv.weight", f"{f}/conv/kernel", t_conv),
                  (f"{kp}bn_scale", f"{f}/scale", t_none),
                  (f"{kp}bn_bias", f"{f}/bias", t_none)]
    # fold (mirror weights_inception.fold_batchnorm for arbitrary paths)
    for path in flax_paths:
        kp = f"{path}." if path else ""
        w = state.pop(f"{kp}bn.weight")
        b = state.pop(f"{kp}bn.bias")
        mean = state.pop(f"{kp}bn.running_mean")
        var = state.pop(f"{kp}bn.running_var")
        state.pop(f"{kp}bn.num_batches_tracked", None)
        scale = w / np.sqrt(var + WI.BN_EPS)
        state[f"{kp}bn_scale"] = scale.astype(np.float32)
        state[f"{kp}bn_bias"] = (b - mean * scale).astype(np.float32)
    return jax.tree_util.tree_map(jnp.asarray, apply_rules(state, rules))


def test_basic_conv_bn_fold_parity():
    torch.manual_seed(0)
    tm = _TorchBasicConv(8, 16, kernel_size=3, stride=2).eval()
    with torch.no_grad():
        _randomize_bn(tm, 1)
        x = torch.randn(2, 8, 17, 17)
        want = tm(x).numpy()

    from from_ddpm_to_stable_diffusion_tpu.models.inception import (
        BasicConv2d)

    params = _import_block(tm, "", [""])
    # single unnamed module: rules produced "/conv/kernel" etc.
    model = BasicConv2d(16, (3, 3), strides=(2, 2))
    got = model.apply({"params": params},
                      jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4)


class _TorchInceptionA(nn.Module):
    """FID variant: avg pool excludes padding."""

    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _TorchBasicConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = _TorchBasicConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = _TorchBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _TorchBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TorchBasicConv(64, 96, kernel_size=3,
                                              padding=1)
        self.branch3x3dbl_3 = _TorchBasicConv(96, 96, kernel_size=3,
                                              padding=1)
        self.branch_pool = _TorchBasicConv(cin, pool_features,
                                           kernel_size=1)

    def forward(self, x):
        bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                          count_include_pad=False)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(bp)], dim=1)


def test_inception_a_parity():
    torch.manual_seed(2)
    tm = _TorchInceptionA(32, 32).eval()
    with torch.no_grad():
        _randomize_bn(tm, 3)
        x = torch.randn(1, 32, 19, 19)
        want = tm(x).numpy()

    branches = ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    params = _import_block(tm, "", branches)
    got = InceptionA(32).apply({"params": params},
                               jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-4)


class _TorchInceptionEMax(nn.Module):
    """The Mixed_7c FID quirk: MAX pooling in the pool branch."""

    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = _TorchBasicConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = _TorchBasicConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = _TorchBasicConv(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3_2b = _TorchBasicConv(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch3x3dbl_1 = _TorchBasicConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _TorchBasicConv(448, 384, kernel_size=3,
                                              padding=1)
        self.branch3x3dbl_3a = _TorchBasicConv(384, 384, kernel_size=(1, 3),
                                               padding=(0, 1))
        self.branch3x3dbl_3b = _TorchBasicConv(384, 384, kernel_size=(3, 1),
                                               padding=(1, 0))
        self.branch_pool = _TorchBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)],
                       1)
        bp = self.branch_pool(F.max_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b3, bd, bp], 1)


def test_inception_e_max_parity():
    torch.manual_seed(4)
    tm = _TorchInceptionEMax(64).eval()
    with torch.no_grad():
        _randomize_bn(tm, 5)
        x = torch.randn(1, 64, 8, 8)
        want = tm(x).numpy()

    branches = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                "branch3x3dbl_3b", "branch_pool"]
    params = _import_block(tm, "", branches)
    got = InceptionE(pool="max").apply(
        {"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-4)


def test_inception_fid_features_pipeline():
    """inception_features on random weights: shape, finiteness, and the
    [0,1] resize path."""
    from from_ddpm_to_stable_diffusion_tpu.utils.metrics import (
        fid_from_features, inception_features)

    model = InceptionV3FID()
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 299, 299, 3)))["params"]
    rng = np.random.default_rng(0)
    imgs_a = rng.random((4, 64, 64, 3)).astype(np.float32)
    imgs_b = rng.random((4, 64, 64, 3)).astype(np.float32)
    fa = inception_features(imgs_a, params, batch_size=2)
    fb = inception_features(imgs_b, params, batch_size=2)
    assert fa.shape == (4, 2048) and np.isfinite(fa).all()
    fid = fid_from_features(np.concatenate([fa, fa]),
                            np.concatenate([fb, fb]))
    assert np.isfinite(fid)
