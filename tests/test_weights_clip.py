"""OpenAI-CLIP / SigLIP importer tests: both-way mapping completeness and
an end-to-end random-weight torch-oracle parity check (the validation the
stage-05 ``check_clip`` path relies on until real weights exist)."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from from_ddpm_to_stable_diffusion_tpu.io import weights_clip as WC
from from_ddpm_to_stable_diffusion_tpu.models.clip import CLIP
from from_ddpm_to_stable_diffusion_tpu.models.siglip import (
    SiglipVisionConfig, SiglipVisionModel)
from tests.test_weights import _invert, _tree_paths

pytestmark = pytest.mark.slow


SMALL = dict(embed_dim=16, image_resolution=28, vision_layers=2,
             vision_width=32, vision_patch_size=14, context_length=10,
             vocab_size=50, transformer_width=16, transformer_heads=2,
             transformer_layers=2)


def test_openai_clip_mapping_roundtrip():
    model = CLIP(**SMALL)
    img = jnp.zeros((1, 28, 28, 3))
    txt = jnp.zeros((1, 10), jnp.int32)
    params = model.init(jax.random.key(0), img, txt)["params"]
    flax_shapes = _tree_paths(jax.tree_util.tree_map(np.asarray, params))
    rules = WC.openai_clip_rules(vision_layers=2, text_layers=2)
    state = _invert(rules, flax_shapes)
    imported = WC.apply_rules(state, rules)
    got = _tree_paths(imported)
    assert got == flax_shapes, (
        f"missing: {sorted(set(flax_shapes) - set(got))[:6]} "
        f"extra: {sorted(set(got) - set(flax_shapes))[:6]}")
    model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported)}, img, txt)


def test_siglip_mapping_roundtrip():
    cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=32, patch_size=16)
    model = SiglipVisionModel(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), img)["params"]
    flax_shapes = _tree_paths(jax.tree_util.tree_map(np.asarray, params))
    rules = WC.siglip_vision_rules(num_layers=2)
    state = _invert(rules, flax_shapes)
    imported = WC.apply_rules(state, rules)
    assert _tree_paths(imported) == flax_shapes
    model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported)}, img)


# --------------------------------------------------------------------------
# torch oracle: a small OpenAI-layout CLIP (independent implementation)
# --------------------------------------------------------------------------
class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _Block(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h, batch_first=True)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(d, 4 * d)), ("gelu", _QuickGELU()),
            ("c_proj", nn.Linear(4 * d, d))]))
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        h, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class _Tf(nn.Module):
    def __init__(self, d, h, n):
        super().__init__()
        self.resblocks = nn.ModuleList([_Block(d, h) for _ in range(n)])

    def forward(self, x, attn_mask=None):
        for b in self.resblocks:
            x = b(x, attn_mask)
        return x


class _Visual(nn.Module):
    def __init__(self, res, patch, w, layers, out_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(3, w, patch, stride=patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(w) * 0.02)
        n = (res // patch) ** 2 + 1
        self.positional_embedding = nn.Parameter(torch.randn(n, w) * 0.02)
        self.ln_pre = nn.LayerNorm(w)
        # vision heads follow the CLIP family convention width//64
        # (ViT-L/14: 1024 -> 16), which CLIPVisionTower hardcodes
        self.transformer = _Tf(w, max(1, w // 64), layers)
        self.ln_post = nn.LayerNorm(w)
        self.proj = nn.Parameter(torch.randn(w, out_dim) * 0.02)

    def forward(self, x):
        x = self.conv1(x).flatten(2).permute(0, 2, 1)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.transformer(self.ln_pre(x))
        return self.ln_post(x[:, 0]) @ self.proj


class _TorchCLIP(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.visual = _Visual(c["image_resolution"],
                              c["vision_patch_size"], c["vision_width"],
                              c["vision_layers"], c["embed_dim"])
        w = c["transformer_width"]
        self.token_embedding = nn.Embedding(c["vocab_size"], w)
        self.positional_embedding = nn.Parameter(
            torch.randn(c["context_length"], w) * 0.02)
        self.transformer = _Tf(w, c["transformer_heads"],
                               c["transformer_layers"])
        self.ln_final = nn.LayerNorm(w)
        self.text_projection = nn.Parameter(
            torch.randn(w, c["embed_dim"]) * 0.02)
        self.logit_scale = nn.Parameter(torch.tensor(np.log(1 / 0.07),
                                                     dtype=torch.float32))

    def forward(self, image, text):
        img = self.visual(image)
        n = text.shape[1]
        mask = torch.full((n, n), float("-inf")).triu(1)
        x = self.token_embedding(text) + self.positional_embedding
        x = self.transformer(x, attn_mask=mask)
        x = self.ln_final(x)
        txt = x[torch.arange(x.shape[0]), text.argmax(dim=-1)] \
            @ self.text_projection
        img = img / img.norm(dim=1, keepdim=True)
        txt = txt / txt.norm(dim=1, keepdim=True)
        return self.logit_scale.exp() * img @ txt.t()


def test_openai_clip_end_to_end_torch_parity():
    """torch oracle state dict (OpenAI in_proj_weight naming) → importer →
    our CLIP: logits must match to fp32 tolerance."""
    torch.manual_seed(0)
    tm = _TorchCLIP(SMALL).eval()
    image = torch.randn(2, 3, 28, 28)
    text = torch.tensor([[1, 5, 7, 2, 49, 0, 0, 0, 0, 0],
                         [1, 9, 49, 0, 0, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        want = tm(image, text).numpy()

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    WC.normalize_openai_attn(state)
    cfg = WC.sniff_clip_config(state)
    for key, val in SMALL.items():
        if key == "transformer_heads":
            continue  # sniffed as width//64 for the real model class
        assert cfg[key] == val, (key, cfg[key], val)
    params = WC.apply_rules(
        state, WC.openai_clip_rules(cfg["vision_layers"],
                                    cfg["transformer_layers"]))

    model = CLIP(**SMALL)
    got, _ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(image.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(text.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_siglip_end_to_end_torch_parity():
    """HF-layout SigLIP vision oracle → importer → SiglipVisionModel."""
    torch.manual_seed(1)
    hidden, inter, layers, heads, img_sz, patch = 32, 64, 2, 4, 32, 16

    class _HFAttn(nn.Module):
        def __init__(self):
            super().__init__()
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                setattr(self, n, nn.Linear(hidden, hidden))

        def forward(self, x):
            b, l, _ = x.shape
            d = hidden // heads

            def split(t):
                return t.view(b, l, heads, d).transpose(1, 2)

            q, k, v = (split(p(x)) for p in
                       (self.q_proj, self.k_proj, self.v_proj))
            o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            return self.out_proj(o.transpose(1, 2).reshape(b, l, hidden))

    class _HFLayer(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer_norm1 = nn.LayerNorm(hidden, eps=1e-6)
            self.self_attn = _HFAttn()
            self.layer_norm2 = nn.LayerNorm(hidden, eps=1e-6)
            self.mlp = nn.Sequential(OrderedDict([
                ("fc1", nn.Linear(hidden, inter)), ("act", nn.GELU("tanh")),
                ("fc2", nn.Linear(inter, hidden))]))

        def forward(self, x):
            x = x + self.self_attn(self.layer_norm1(x))
            return x + self.mlp(self.layer_norm2(x))

    class _HFVision(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embedding = nn.Conv2d(3, hidden, patch, stride=patch)
            n = (img_sz // patch) ** 2
            self.position_embedding = nn.Embedding(n, hidden)
            self.layers = nn.ModuleList([_HFLayer() for _ in range(layers)])
            self.post_layernorm = nn.LayerNorm(hidden, eps=1e-6)

        def forward(self, x):
            h = self.patch_embedding(x).flatten(2).permute(0, 2, 1)
            h = h + self.position_embedding.weight
            for layer in self.layers:
                h = layer(h)
            return self.post_layernorm(h)

    tm = _HFVision().eval()
    image = torch.randn(2, 3, img_sz, img_sz)
    with torch.no_grad():
        want = tm(image).numpy()

    # HF checkpoint naming: vision_model.{embeddings.*, encoder.layers.*}
    state = {}
    for k, v in tm.state_dict().items():
        if k.startswith(("patch_embedding", "position_embedding")):
            nk = f"vision_model.embeddings.{k}"
        elif k.startswith("layers."):
            nk = f"vision_model.encoder.{k}"
        else:
            nk = f"vision_model.{k}"
        state[nk] = v.numpy()

    cfg = WC.sniff_siglip_config(state)
    assert (cfg["hidden_size"], cfg["num_hidden_layers"],
            cfg["patch_size"], cfg["image_size"],
            cfg["intermediate_size"]) == (hidden, layers, patch, img_sz,
                                          inter)
    WC.fuse_siglip_attn(state, layers)
    params = WC.apply_rules(state, WC.siglip_vision_rules(layers))

    model = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        image_size=img_sz, patch_size=patch))
    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(image.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_check_clip_pretrained_cli(tmp_path):
    """cli.checks clip --ckpt: synthetic ViT checkpoint + vocab + image ->
    a probability distribution over the candidate captions (the stage-05
    check's plumbing, runnable today; numerics pinned by the torch-parity
    test above)."""
    import json

    from PIL import Image

    from from_ddpm_to_stable_diffusion_tpu.cli.checks import (
        check_clip_pretrained)
    from from_ddpm_to_stable_diffusion_tpu.io.tokenizer import (
        build_simple_vocab)

    vocab, merges = build_simple_vocab(["a", "cat", "dog", "wild", "animal"])
    # model vocab must cover every id the tiny vocab can emit (out-of-range
    # ids NaN through Embed's out-of-bounds fill)
    cfg_small = dict(SMALL, vocab_size=len(vocab))
    model = CLIP(**cfg_small)
    params = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)),
                        jnp.zeros((1, 10), jnp.int32))["params"]
    flax_shapes = _tree_paths(jax.tree_util.tree_map(np.asarray, params))
    rules = WC.openai_clip_rules(vision_layers=2, text_layers=2)
    state = {k: torch.from_numpy(v)
             for k, v in _invert(rules, flax_shapes).items()}
    # back to OpenAI naming for the in_proj tensors
    for k in list(state):
        if ".in_proj." in k:
            state[k.replace(".in_proj.", ".in_proj_")] = state.pop(k)
    ckpt = tmp_path / "clip.pt"
    torch.save(state, ckpt)

    (tmp_path / "vocab.json").write_text(json.dumps(vocab,
                                                    ensure_ascii=False))
    lines = ["#version: 0.2"] + [
        f"{a} {b}" for (a, b), _ in sorted(merges.items(),
                                           key=lambda kv: kv[1])]
    (tmp_path / "merges.txt").write_text("\n".join(lines) + "\n")
    img = tmp_path / "cat.png"
    Image.fromarray(
        (np.random.default_rng(0).random((40, 40, 3)) * 255).astype(
            np.uint8)).save(img)

    probs = check_clip_pretrained(str(ckpt), str(img), str(tmp_path))
    assert probs.shape == (3,)
    np.testing.assert_allclose(float(probs.sum()), 1.0, atol=1e-5)


def test_check_siglip_pretrained_cli(tmp_path):
    """cli.checks clip --siglip-ckpt: synthetic HF-layout checkpoint +
    image -> finite patch features (head keys dropped by the importer)."""
    from PIL import Image

    from from_ddpm_to_stable_diffusion_tpu.cli.checks import (
        check_siglip_pretrained)

    rng = np.random.default_rng(7)
    hidden, inter, layers, patch = 32, 64, 2, 16
    state = {
        "vision_model.embeddings.patch_embedding.weight":
            rng.standard_normal((hidden, 3, patch, patch)) * 0.05,
        "vision_model.embeddings.patch_embedding.bias":
            rng.standard_normal(hidden) * 0.05,
        "vision_model.embeddings.position_embedding.weight":
            rng.standard_normal((4, hidden)) * 0.05,
        "vision_model.post_layernorm.weight": np.ones(hidden),
        "vision_model.post_layernorm.bias": np.zeros(hidden),
        # pooling head the importer must drop
        "vision_model.head.probe": rng.standard_normal((1, 1, hidden)),
    }
    for i in range(layers):
        p = f"vision_model.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            state[f"{p}.{ln}.weight"] = np.ones(hidden)
            state[f"{p}.{ln}.bias"] = np.zeros(hidden)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[f"{p}.self_attn.{proj}.weight"] = \
                rng.standard_normal((hidden, hidden)) * 0.05
            state[f"{p}.self_attn.{proj}.bias"] = np.zeros(hidden)
        state[f"{p}.mlp.fc1.weight"] = rng.standard_normal(
            (inter, hidden)) * 0.05
        state[f"{p}.mlp.fc1.bias"] = np.zeros(inter)
        state[f"{p}.mlp.fc2.weight"] = rng.standard_normal(
            (hidden, inter)) * 0.05
        state[f"{p}.mlp.fc2.bias"] = np.zeros(hidden)
    ckpt = tmp_path / "siglip.pt"
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in state.items()}, ckpt)
    img = tmp_path / "img.png"
    Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(
        img)
    feats = check_siglip_pretrained(str(ckpt), str(img))
    assert feats.shape == (1, 4, hidden)
    assert np.isfinite(np.asarray(feats)).all()
