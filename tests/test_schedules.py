"""Golden tests for schedule tables vs independently-coded oracles.

Oracles re-derive the reference math (SURVEY.md §2.1/2.6) with torch/numpy in
the test body, so any drift in the library implementation is caught.
"""

import numpy as np
import pytest
import torch

from from_ddpm_to_stable_diffusion_tpu.ops import schedules


def test_alphas_cumprod_matches_torch_oracle():
    got = schedules.get_alphas_cumprod()
    betas = (
        torch.linspace(0.00085**0.5, 0.0120**0.5, 1000, dtype=torch.float32) ** 2
    )
    want = torch.cumprod(1.0 - betas, dim=0).numpy()
    # torch/numpy fp32 linspace differ in the last ulp; 5e-6 covers it
    np.testing.assert_allclose(got, want, rtol=5e-6)
    assert got.shape == (1000,)
    assert got[0] > got[-1] > 0


def test_karras_sigma_schedule_properties():
    sigmas, timesteps = schedules.karras_sigma_schedule(50)
    assert sigmas.shape == (51,)
    assert timesteps.shape == (50,)
    assert sigmas[-1] == 0.0
    assert np.all(np.diff(sigmas) < 0)  # strictly decreasing
    # initial_scale = sigmas.max() = sigmas[0] ~ 14.6 for SD1 defaults
    assert sigmas[0] == sigmas.max()
    assert 14.0 < sigmas[0] < 15.0
    np.testing.assert_allclose(timesteps[0], 999.0)
    np.testing.assert_allclose(timesteps[-1], 0.0)


def test_input_scale():
    sigmas, _ = schedules.karras_sigma_schedule(50)
    s = schedules.input_scale(sigmas)
    np.testing.assert_allclose(s, 1.0 / np.sqrt(sigmas**2 + 1.0))


def test_lms_coefficients_match_per_step_oracle():
    """Table must reproduce the reference's per-step trapezoid-of-Lagrange math."""
    sigmas, _ = schedules.karras_sigma_schedule(10)
    order = 4
    table = schedules.lms_coefficients(sigmas, order=order)
    # Oracle: simulate the reference's rolling-history loop.
    for t in range(10):
        m = min(t + 1, order)
        for i in range(m):
            x = np.linspace(sigmas[t], sigmas[t + 1], 81)
            y = np.ones(81)
            for j in range(m):
                if i == j:
                    continue
                y *= x - sigmas[t - j]
                y /= sigmas[t - i] - sigmas[t - j]
            want = np.trapezoid(y=y, x=x)
            np.testing.assert_allclose(table[t, i], want, rtol=1e-12)
        # unfilled history slots must be exactly zero
        assert np.all(table[t, m:] == 0.0)


def test_lms_first_step_is_euler():
    """With one history entry the LMS coefficient is ∫1 dx = σ_{t+1} − σ_t."""
    sigmas, _ = schedules.karras_sigma_schedule(50)
    table = schedules.lms_coefficients(sigmas, order=4)
    np.testing.assert_allclose(table[0, 0], sigmas[1] - sigmas[0], rtol=1e-12)


def test_ddpm_tables_match_torch_oracle():
    T, b1, bT = 1000, 0.0015, 0.0195
    tabs = schedules.ddpm_tables(b1, bT, T)
    betas = torch.linspace(b1, bT, T).double()
    alphas = 1.0 - betas
    alphas_bar = torch.cumprod(alphas, dim=0)
    alphas_bar_prev = torch.nn.functional.pad(alphas_bar, [1, 0], value=1)[:T]
    coeff1 = torch.sqrt(1.0 / alphas)
    coeff2 = coeff1 * (1.0 - alphas) / torch.sqrt(1.0 - alphas_bar)
    post_var = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
    np.testing.assert_allclose(tabs.sqrt_alphas_bar,
                               torch.sqrt(alphas_bar).float().numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        tabs.sqrt_one_minus_alphas_bar,
        torch.sqrt(1.0 - alphas_bar).float().numpy(), rtol=1e-6)
    np.testing.assert_allclose(tabs.coeff1, coeff1.float().numpy(), rtol=1e-6)
    np.testing.assert_allclose(tabs.coeff2, coeff2.float().numpy(), rtol=1e-6)
    np.testing.assert_allclose(tabs.posterior_var, post_var.float().numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(
        tabs.sampler_var,
        torch.cat([post_var[1:2], betas[1:]]).float().numpy(), rtol=1e-6)


def test_flow_sigma_shift():
    # shift=1 is identity on t/1000
    np.testing.assert_allclose(schedules.flow_sigma(500.0, 1.0), 0.5)
    # shift=3, t=1000 -> sigma=1
    np.testing.assert_allclose(schedules.flow_sigma(1000.0, 3.0), 1.0)
    # monotone increasing in t
    s = schedules.flow_sigma(np.arange(1, 1001, dtype=np.float64), 3.0)
    assert np.all(np.diff(s) > 0)


def test_sd3_sigma_schedule():
    sigs = schedules.sd3_sigma_schedule(steps=50, shift=3.0)
    assert sigs.shape == (51,)
    assert sigs[-1] == 0.0
    np.testing.assert_allclose(sigs[0], 1.0, rtol=1e-6)  # sigma_max = sigma(1000)
    assert np.all(np.diff(sigs) < 0)


def test_cosine_warmup_lr():
    import jax

    sched = schedules.cosine_warmup_lr(
        base_lr=2e-6, max_lr=1e-4, warmup_epochs=7, total_epochs=70,
        steps_per_epoch=10)
    lr0 = float(sched(0))
    np.testing.assert_allclose(lr0, 2e-6, rtol=1e-5)
    # end of warmup hits ~max_lr
    lr_w = float(sched(7 * 10))
    np.testing.assert_allclose(lr_w, 1e-4, rtol=1e-4)
    # final epoch anneals to ~0
    lr_end = float(sched(70 * 10))
    assert lr_end < 1e-6
    # schedule is jittable
    jitted = jax.jit(sched)
    np.testing.assert_allclose(float(jitted(35)), float(sched(35)), rtol=1e-6)
