"""Typed configs with YAML loading.

Key names are byte-compatible with the reference's only config file
(/root/reference/00_assets/yml/tiny_sd_direct.yml:1-19) so existing YAMLs load
unchanged; everywhere the reference used inline dicts
(03_.../02_train_vae.py:68-79, 04_...:66-81) we expose the same knobs as
dataclass fields with the reference's defaults (they are the reproduction
contract).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import yaml


@dataclasses.dataclass
class TinySDConfig:
    """Stage-06 tiny stable diffusion training config."""

    epoch: int = 70
    epoch_awoken: Optional[int] = None
    batch_size: int = 32
    img_channel: int = 3
    img_size: int = 64
    num_class: int = 3
    T: int = 1000
    beta_1: float = 0.0015
    beta_T: float = 0.0195
    channel: int = 128
    channel_multy: List[int] = dataclasses.field(default_factory=lambda: [1, 2, 2, 2])
    dropout: float = 0.1
    lr: float = 2.0e-6
    max_lr: float = 1.0e-4
    grad_clip: float = 1.0
    train_rand: float = 0.05
    w: float = 1.8
    nrow: int = 7
    model_dir: str = "./checkpoints/tiny_sd"
    # TPU-native additions (absent from the reference; defaults keep parity)
    warmup_epochs: int = 7
    dtype: str = "bf16"
    seed: int = 0
    data_dir: Optional[str] = None
    mesh_shape: Optional[dict] = None  # e.g. {"data": 8}
    ema_decay: Optional[float] = None
    # optimizer applies the AVERAGE gradient of this many micro-batches
    # (optax.MultiSteps) — k× the effective batch at 1× the activation HBM
    grad_accum: int = 1

    @classmethod
    def from_yaml(cls, path: str) -> "TinySDConfig":
        with open(path) as f:
            raw = yaml.safe_load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "TinySDConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in raw.items() if k in fields}
        unknown = set(raw) - fields
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**known)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass
class FlowTrainConfig:
    """Rectified-flow (SD3-style) MMDiT training config.

    The reference only *infers* SD3 (02_stable_diffusion-3/sd3_infer.py);
    training its architecture is a framework capability on top. Schedule
    knobs (shift, num_timesteps) mirror ModelSamplingDiscreteFlow
    (sd3_infer.py:47-79) so a trained model samples with the same
    flow-Euler path as the imported checkpoints.
    """

    epoch: int = 10
    epoch_awoken: Optional[int] = None
    batch_size: int = 8
    img_size: int = 32           # LATENT spatial size fed to the MMDiT
    context_len: int = 154       # text-context tokens (SD3: 77+77)
    shift: float = 3.0           # σ(t) = shift·t/(1+(shift−1)·t)
    num_timesteps: int = 1000
    lr: float = 1.0e-5
    max_lr: float = 1.0e-4
    warmup_epochs: int = 1
    grad_clip: float = 1.0
    train_rand: float = 0.1      # cond-drop probability (CFG training)
    w: float = 5.0               # CFG scale at sampling (SD3 default)
    sample_steps: int = 50
    model_dir: str = "./checkpoints/mmdit"
    dtype: str = "bf16"
    seed: int = 0
    mesh_shape: Optional[dict] = None
    ema_decay: Optional[float] = None
    grad_accum: int = 1          # micro-batches per optimizer update
    moe_aux_weight: float = 0.01  # Switch balance-loss coefficient

    from_yaml = classmethod(lambda cls, path: cls(**yaml.safe_load(open(path))))


@dataclasses.dataclass
class VAETrainConfig:
    """Stage-03 VAE/VQ-VAE training (reference 02_train_vae.py:68-79)."""

    epoch: int = 40
    batch_size: int = 7
    img_size: int = 512
    lr: float = 1e-4
    weight_decay: float = 1e-4
    embedding_dim: int = 4
    num_embeddings: int = 128
    model: str = "vqvae"  # vqvae | vanilla
    latent_dim: int = 512  # vanilla VAE latent
    kld_weight: float = 0.00025
    model_dir: str = "./checkpoints/vae"
    seed: int = 0
    dtype: str = "bf16"
    data_dir: Optional[str] = None

    from_yaml = classmethod(lambda cls, path: cls(**yaml.safe_load(open(path))))


@dataclasses.dataclass
class ViTTrainConfig:
    """Stage-04 ViT classification (reference 01_train_classification.py:66-81)."""

    epoch: int = 10
    batch_size: int = 256
    img_size: int = 128
    patch_size: int = 32
    dim: int = 512
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 1024
    num_class: int = 3
    dropout: float = 0.1
    emb_dropout: float = 0.1
    lr: float = 1e-4
    model_dir: str = "./checkpoints/vit"
    seed: int = 0
    dtype: str = "bf16"
    data_dir: Optional[str] = None

    from_yaml = classmethod(lambda cls, path: cls(**yaml.safe_load(open(path))))
