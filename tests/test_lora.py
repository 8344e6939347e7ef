"""LoRA fine-tuning: zero-effect init, adapter-only training, rank-generic.

utils/lora.py has no reference counterpart (the reference never
fine-tunes); these tests pin the framework contract: merged == base at
init (B zero-init), training moves ONLY the adapters, conv kernels adapt
rank-generically, and the DDPMTrainer integration trains + samples.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import DDPMTrainer
from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig
from from_ddpm_to_stable_diffusion_tpu.utils.lora import (
    DEFAULT_TARGETS, init_lora, merge_lora, num_lora_params)


def small_params():
    r = np.random.default_rng(0)
    return {
        "attn": {"qkv": {"kernel": jnp.asarray(
            r.normal(size=(16, 48)), jnp.float32)},
            "out": {"kernel": jnp.asarray(
                r.normal(size=(16, 16)), jnp.float32),
                "bias": jnp.zeros((16,))}},
        "conv_in": {"kernel": jnp.asarray(
            r.normal(size=(3, 3, 4, 16)), jnp.float32)},
        "norm": {"scale": jnp.ones((16,))},
    }


def test_merge_is_identity_at_init():
    params = small_params()
    lora = init_lora(jax.random.key(0), params, rank=4)
    merged = merge_lora(params, lora)
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_targets_and_rank_generic_conv():
    params = small_params()
    lora = init_lora(jax.random.key(0), params, rank=4,
                     targets=re.compile(r"(qkv|out|conv_in)[^/]*/kernel$"))
    assert set(lora) == {"attn/qkv/kernel", "attn/out/kernel",
                         "conv_in/kernel"}
    # conv kernel (3,3,4,16): A keeps the leading dims + rank
    assert lora["conv_in/kernel"]["a"].shape == (3, 3, 4, 4)
    assert lora["conv_in/kernel"]["b"].shape == (4, 16)
    # bias/norm/default non-matches excluded
    assert num_lora_params(lora) == (16 * 4 + 4 * 48) + (16 * 4 + 4 * 16) \
        + (3 * 3 * 4 * 4 + 4 * 16)
    # a nonzero B produces a genuinely different merged kernel
    lora["attn/qkv/kernel"]["b"] = jnp.ones_like(
        lora["attn/qkv/kernel"]["b"])
    merged = merge_lora(params, lora)
    assert not np.allclose(np.asarray(merged["attn"]["qkv"]["kernel"]),
                           np.asarray(params["attn"]["qkv"]["kernel"]))


def test_grads_flow_to_adapters_not_base():
    params = small_params()
    lora = init_lora(jax.random.key(0), params, rank=2)
    x = jnp.ones((2, 16))

    def loss(lora, base):
        p = merge_lora(base, lora)
        return jnp.sum(jnp.square(x @ p["attn"]["qkv"]["kernel"]))

    g = jax.grad(loss)(lora, params)
    # b gets gradient through the merge even though it is zero-init
    assert np.abs(np.asarray(g["attn/qkv/kernel"]["b"])).max() > 0


@pytest.mark.slow
def test_ddpm_trainer_lora(devices8):
    cfg = TinySDConfig(
        epoch=10, batch_size=8, img_size=16, img_channel=3, num_class=3,
        T=10, channel=32, channel_multy=[1, 2, 2, 2], dropout=0.0,
        lr=1e-4, max_lr=2e-2, warmup_epochs=1, train_rand=0.1,
        dtype="fp32", seed=0)
    base_trainer = DDPMTrainer(cfg)
    base_state = base_trainer.create_state(steps_per_epoch=4)
    base = jax.device_get(base_state.params)

    trainer = DDPMTrainer(cfg, lora_rank=4, base_params=base)
    state = trainer.create_state(steps_per_epoch=4)
    n_lora = trainer.num_params(state)
    n_full = base_trainer.num_params(base_state)
    assert n_lora < 0.2 * n_full, (n_lora, n_full)

    imgs = np.random.default_rng(0).uniform(
        -1, 1, (8, 16, 16, 3)).astype(np.float32)
    labels = (np.arange(8) % 3).astype(np.int32)
    rng = jax.random.key(2)
    losses = []
    for _ in range(40):
        state, loss = trainer.train_step(state, imgs, labels, rng)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # adapter-only capacity: measured curve drops ~130 → ~98 over 40 steps
    assert np.mean(losses[-5:]) < 0.85 * np.mean(losses[:5])

    # the frozen base is bit-identical after training
    for a, b in zip(jax.tree_util.tree_leaves(
            jax.device_get(trainer._base_params)),
            jax.tree_util.tree_leaves(base)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # adapters actually moved, and sampling runs through the merge
    moved = [k for k, e in state.params.items()
             if np.abs(np.asarray(e["b"])).max() > 0]
    assert moved
    out = trainer.sample(state, labels=[1, 2])
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_default_targets_cover_attention():
    assert DEFAULT_TARGETS.search("enc2_att/attn1/qkv/kernel")
    assert DEFAULT_TARGETS.search("dec2_att/geglu_out/kernel")
    assert not DEFAULT_TARGETS.search("enc1_res/norm1/scale")
    assert not DEFAULT_TARGETS.search("enc2_att/attn1/qkv/bias")
