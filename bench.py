"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (round 1): tiny-SD (stage 06) training throughput at the reference
op point — 64×64, batch 32, base channel 128, bf16 compute — in imgs/sec on
one TPU chip. The reference publishes no numbers (BASELINE.md: published={}),
so ``vs_baseline`` is reported as null; the absolute number is the contract.

Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_tiny_sd_train(iters: int = 20, warmup: int = 3):
    from from_ddpm_to_stable_diffusion_tpu.pipelines.ddpm_trainer import DDPMTrainer
    from from_ddpm_to_stable_diffusion_tpu.utils.config import TinySDConfig

    cfg = TinySDConfig(dtype="bf16", dropout=0.1)
    trainer = DDPMTrainer(cfg)
    state = trainer.create_state(steps_per_epoch=100)
    print(f"[bench] tiny-SD UNet params: {trainer.num_params(state):,}",
          file=sys.stderr)
    rng = jax.random.key(0)
    images = np.random.default_rng(0).uniform(
        -1, 1, (cfg.batch_size, cfg.img_size, cfg.img_size,
                cfg.img_channel)).astype(np.float32)
    labels = np.arange(cfg.batch_size, dtype=np.int32) % cfg.num_class

    t_compile = time.perf_counter()
    for _ in range(warmup):
        state, loss = trainer.train_step(state, images, labels, rng)
    jax.block_until_ready(loss)
    print(f"[bench] warmup+compile: {time.perf_counter()-t_compile:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer.train_step(state, images, labels, rng)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    step_ms = dt / iters * 1e3
    imgs_per_sec = cfg.batch_size * iters / dt
    print(f"[bench] train step: {step_ms:.1f} ms  ({imgs_per_sec:.1f} imgs/s)",
          file=sys.stderr)
    return imgs_per_sec, step_ms


def main():
    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    imgs_per_sec, step_ms = bench_tiny_sd_train()
    print(json.dumps({
        "metric": "tiny_sd_train_imgs_per_sec_per_chip_64px_bs32_bf16",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "extra": {"step_ms": round(step_ms, 2)},
    }))


if __name__ == "__main__":
    main()
