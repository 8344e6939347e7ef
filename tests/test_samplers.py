"""Sampler tests: scan loops vs straight-Python oracles of the reference math."""

import jax
import jax.numpy as jnp
import numpy as np

from from_ddpm_to_stable_diffusion_tpu.ops import schedules
from from_ddpm_to_stable_diffusion_tpu.samplers import (
    KSamplerConfig, ddpm_loss, ddpm_sample, flow_euler_sample, k_sampler_scan,
    sigma_tables)


def _linear_denoiser(x, t):
    """A fake model: output depends on x and t so trajectory order matters."""
    return 0.1 * x + 0.01 * jnp.asarray(t, x.dtype)


def _python_k_lms(x, sigmas, timesteps, scales, order=4):
    """Direct transcription of the reference rolling-history LMS loop."""
    outputs = []
    x = np.asarray(x, np.float64)
    for t in range(len(timesteps)):
        out = np.asarray(_linear_denoiser(jnp.asarray(x * scales[t], jnp.float32),
                                          float(timesteps[t])), np.float64)
        outputs = [out] + outputs[: order - 1]
        for i, o in enumerate(outputs):
            xs = np.linspace(sigmas[t], sigmas[t + 1], 81)
            y = np.ones(81)
            for j in range(len(outputs)):
                if i == j:
                    continue
                y *= (xs - sigmas[t - j]) / (sigmas[t - i] - sigmas[t - j])
            x = x + np.trapezoid(y, xs) * o
    return x


def test_k_lms_matches_reference_loop():
    cfg = KSamplerConfig(method="k_lms", n_inference_steps=12)
    tabs = sigma_tables(cfg)
    x0 = np.random.default_rng(0).standard_normal((1, 4, 4, 2)).astype(np.float32)
    got = np.asarray(k_sampler_scan(_linear_denoiser, jnp.asarray(x0), cfg,
                                    tables=tabs))
    want = _python_k_lms(x0, tabs["sigmas"], tabs["timesteps"],
                         tabs["input_scales"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_jit_step_loop_matches_scan():
    """loop='jit_step' must be bit-identical math to the lax.scan driver
    for every sampler method."""
    for method in ("k_lms", "k_euler", "k_euler_ancestral"):
        cfg = KSamplerConfig(method=method, n_inference_steps=8)
        tabs = sigma_tables(cfg)
        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (1, 4, 4, 2)).astype(np.float32))
        rng = jax.random.key(3)
        scan = np.asarray(k_sampler_scan(_linear_denoiser, x, cfg, rng=rng,
                                         tables=tabs, loop="scan"))
        stepped = np.asarray(k_sampler_scan(_linear_denoiser, x, cfg, rng=rng,
                                            tables=tabs, loop="jit_step"))
        np.testing.assert_allclose(stepped, scan, rtol=1e-6, atol=1e-7,
                                   err_msg=method)


def test_k_euler_matches_loop():
    cfg = KSamplerConfig(method="k_euler", n_inference_steps=10)
    tabs = sigma_tables(cfg)
    x = np.random.default_rng(1).standard_normal((2, 3, 3, 1)).astype(np.float32)
    got = np.asarray(k_sampler_scan(_linear_denoiser, jnp.asarray(x), cfg,
                                    tables=tabs))
    want = x.astype(np.float64)
    for t in range(10):
        out = np.asarray(_linear_denoiser(
            jnp.asarray(want * tabs["input_scales"][t], jnp.float32),
            float(tabs["timesteps"][t])), np.float64)
        want = want + out * (tabs["sigmas"][t + 1] - tabs["sigmas"][t])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_k_euler_ancestral_runs_and_is_deterministic_per_seed():
    cfg = KSamplerConfig(method="k_euler_ancestral", n_inference_steps=8)
    x = jnp.ones((1, 4, 4, 1))
    a = k_sampler_scan(_linear_denoiser, x, cfg, rng=jax.random.key(0))
    b = k_sampler_scan(_linear_denoiser, x, cfg, rng=jax.random.key(0))
    c = k_sampler_scan(_linear_denoiser, x, cfg, rng=jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0
    assert np.all(np.isfinite(np.asarray(a)))


def test_k_sampler_strength_start_step():
    cfg = KSamplerConfig(method="k_euler", n_inference_steps=10, strength=0.5)
    tabs = sigma_tables(cfg)
    assert tabs["start_step"] == 5
    assert tabs["initial_scale"] == tabs["sigmas"][5]


def test_ddpm_loss_and_sample():
    T = 20
    tabs = schedules.ddpm_tables(0.0015, 0.0195, T)

    def model(x, t, labels):
        # pseudo-eps model: depends on label so CFG differs from uncond
        return 0.05 * x + 0.01 * labels[:, None, None, None].astype(x.dtype)

    x0 = jnp.ones((2, 8, 8, 3))
    labels = jnp.asarray([1, 2])
    loss = ddpm_loss(model, tabs, x0, labels, jax.random.key(0), T)
    assert loss.shape == x0.shape
    assert np.all(np.isfinite(np.asarray(loss)))

    x_T = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    out = ddpm_sample(model, tabs, x_T, labels, jax.random.key(2), T, w=1.8)
    assert out.shape == x_T.shape
    a = np.asarray(out)
    assert np.all(np.isfinite(a)) and a.min() >= -1.0 and a.max() <= 1.0

    # batched-CFG and two-forward CFG must agree exactly
    out2 = ddpm_sample(model, tabs, x_T, labels, jax.random.key(2), T, w=1.8,
                       batched_cfg=False)
    np.testing.assert_allclose(a, np.asarray(out2), atol=1e-5)


def test_flow_euler_matches_loop():
    sigmas = schedules.sd3_sigma_schedule(steps=6, shift=3.0)

    def denoiser(x, sigma):
        return 0.9 * x - 0.05 * sigma

    x0 = np.random.default_rng(2).standard_normal((1, 4, 4, 2)).astype(np.float32)
    got = np.asarray(flow_euler_sample(denoiser, jnp.asarray(x0), steps=6,
                                       shift=3.0))
    want = x0.astype(np.float64)
    for i in range(6):
        s = sigmas[i]
        den = 0.9 * want - 0.05 * s
        d = (want - den) / s
        want = want + d * (sigmas[i + 1] - s)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flow_euler_trajectory():
    x0 = jnp.ones((1, 2, 2, 1))
    final, traj = flow_euler_sample(lambda x, s: x * 0.5, x0, steps=4,
                                    keep_trajectory=True)
    assert traj.shape == (4,) + x0.shape
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final))


def test_flow_heun_second_order_convergence():
    """Heun must integrate the same flow ODE at 2nd order: against a
    1024-step Euler reference on a nonlinear denoiser, Heun@N beats
    Euler@N by a wide margin and error shrinks ~4x when N doubles
    (Euler's only halves). Final step (sigma_next=0) falls back to Euler
    by design — never evaluates the model at sigma=0."""
    from from_ddpm_to_stable_diffusion_tpu.samplers.flow import (
        flow_heun_sample)

    def denoiser(x, sigma):
        # a CONSISTENT synthetic flow model: denoised = x − σ·v with a
        # smooth bounded velocity field v(x, σ) — so d = (x−denoised)/σ
        # recovers v exactly and the ODE x' = v has no σ→0 singularity
        # (a denoiser with denoised(σ→0) ≠ x makes the true ODE blow up
        # and no integrator converges)
        v = jnp.tanh(x) * (1.0 - 0.5 * sigma) + 0.1 * sigma
        return x - sigma * v

    x0 = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 4, 4, 2)), jnp.float32)
    ref = np.asarray(flow_euler_sample(denoiser, x0, steps=1024, shift=3.0),
                     np.float64)

    def err(fn, n):
        out = np.asarray(fn(denoiser, x0, steps=n, shift=3.0), np.float64)
        return float(np.linalg.norm(out - ref))

    e_eul_8, e_eul_32 = err(flow_euler_sample, 8), err(flow_euler_sample, 32)
    e_heun_8, e_heun_16 = err(flow_heun_sample, 8), err(flow_heun_sample, 16)
    assert e_heun_8 < 0.25 * e_eul_8          # 2nd order beats 1st
    assert e_heun_8 < e_eul_32                # ~half the model calls, better
    assert e_heun_16 < 0.35 * e_heun_8        # ~4x shrink per doubling


def test_flow_heun_trajectory_and_final_step():
    from from_ddpm_to_stable_diffusion_tpu.samplers.flow import (
        flow_heun_sample)

    calls = []

    def denoiser(x, sigma):
        calls.append(1)
        return x * 0.5

    x0 = jnp.ones((1, 2, 2, 1))
    final, traj = flow_heun_sample(denoiser, x0, steps=4,
                                   keep_trajectory=True)
    assert traj.shape == (4,) + x0.shape
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final))


def _dpmpp_2m_reference(denoise_np, x, sigmas):
    """k-diffusion sample_dpmpp_2m in plain numpy (the oracle)."""
    t_fn = lambda sigma: -np.log(sigma)
    sigma_fn = lambda t: np.exp(-t)
    old_denoised = None
    for i in range(len(sigmas) - 1):
        eps = denoise_np(x / np.sqrt(sigmas[i] ** 2 + 1.0), i)
        denoised = x - sigmas[i] * eps
        if sigmas[i + 1] == 0:
            x = denoised
        else:
            t, t_next = t_fn(sigmas[i]), t_fn(sigmas[i + 1])
            h = t_next - t
            if old_denoised is None:
                d = denoised
            else:
                h_last = t - t_fn(sigmas[i - 1])
                r = h_last / h
                d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x = (sigma_fn(t_next) / sigma_fn(t)) * x + np.expm1(-h) * (-d)
        old_denoised = denoised
    return x


def test_dpmpp_2m_matches_reference_loop():
    cfg = KSamplerConfig(method="dpmpp_2m", n_inference_steps=12)
    tabs = sigma_tables(cfg)
    sigmas = np.asarray(tabs["sigmas"], np.float64)
    x0 = np.random.default_rng(3).standard_normal((1, 4, 4, 2)).astype(
        np.float32)

    # deterministic mock ε-model: mixes the input with a fixed pattern
    pattern = np.random.default_rng(4).standard_normal(x0.shape).astype(
        np.float32)

    def denoise_np(x, i):
        return 0.3 * x + 0.05 * pattern * (i + 1)

    want = _dpmpp_2m_reference(denoise_np, x0.astype(np.float64), sigmas)

    steps_seen = []

    def denoise_jax(x, timestep):
        # timestep identifies the step: map back to index via table lookup
        idx = jnp.argmin(jnp.abs(jnp.asarray(tabs["timesteps"]) - timestep))
        return 0.3 * x + 0.05 * jnp.asarray(pattern) * (idx + 1.0)

    got = k_sampler_scan(denoise_jax, jnp.asarray(x0), cfg)
    np.testing.assert_allclose(np.asarray(got), want.astype(np.float32),
                               rtol=2e-4, atol=2e-4)


def test_dpmpp_2m_in_sd1_generate_contract():
    """dpmpp_2m is selectable through the SD1 pipeline surface."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import SAMPLERS

    assert "dpmpp_2m" in SAMPLERS
