"""Samplers and schedules, all expressed as jittable `lax.scan` step functions."""

from .ddpm import ddpm_loss, ddpm_sample
from .k_samplers import KSamplerConfig, k_sampler_scan, sigma_tables
from .flow import flow_euler_sample
