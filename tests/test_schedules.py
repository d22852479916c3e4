"""Schedule + extract tests — coverage mirrors the reference's
``testing/test_diffusion_utils.py`` (shape/value/clamping of extract, linear
beta endpoints & monotonicity, cosine beta range, alpha-bar monotone decrease,
cumprod identities, broadcasting), plus golden-value checks against closed
forms the reference never had."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.ops import (
    DiffusionConfig,
    beta_schedule_cosine,
    beta_schedule_linear,
    extract,
    make_schedule,
)


def test_linear_beta_endpoints_and_monotonicity():
    T = 1000
    betas = beta_schedule_linear(T, 1e-4, 2e-2)
    assert betas.shape == (T,)
    assert betas.dtype == np.float32
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 2e-2, rtol=1e-6)
    assert np.all(np.diff(betas) > 0)
    # golden: exact linspace values
    np.testing.assert_allclose(betas[1] - betas[0], (2e-2 - 1e-4) / (T - 1), rtol=1e-5)


def test_cosine_beta_range_and_shape():
    T = 1000
    betas = beta_schedule_cosine(T)
    assert betas.shape == (T,)
    assert np.all(betas >= 1e-8)
    assert np.all(betas <= 0.999)
    assert np.all(np.isfinite(betas))


def test_cosine_alpha_bar_golden():
    # alpha_bar(t) should track cos^2 formula (normalized so ab(0)=1)
    T, s = 100, 0.008
    betas = beta_schedule_cosine(T, s=s)
    ab = np.cumprod(1.0 - betas)

    def f(u):
        return math.cos((math.pi / 2) * ((u + s) / (1 + s))) ** 2

    for frac in (0.1, 0.5, 0.9):
        i = int(frac * T)
        expected = f((i + 1) / T) / f(0.0)
        np.testing.assert_allclose(ab[i], expected, rtol=1e-3)


@pytest.mark.parametrize("schedule", ["linear", "cosine"])
def test_alpha_bar_monotone_decreasing(schedule):
    sched = make_schedule(DiffusionConfig(T=1000, schedule=schedule))
    ab = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(ab) < 0)
    assert ab[0] < 1.0
    assert ab[-1] > 0.0


def test_derived_table_identities():
    cfg = DiffusionConfig(T=500, schedule="linear")
    sched = make_schedule(cfg)
    betas = np.asarray(sched.betas)
    alphas = np.asarray(sched.alphas)
    ab = np.asarray(sched.alphas_cumprod)
    ab_prev = np.asarray(sched.alphas_cumprod_prev)

    np.testing.assert_allclose(alphas, 1.0 - betas, rtol=1e-6)
    np.testing.assert_allclose(ab, np.cumprod(alphas), rtol=1e-5)
    assert ab_prev[0] == 1.0
    np.testing.assert_allclose(ab_prev[1:], ab[:-1], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod) ** 2, ab, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2, 1.0 - ab, atol=1e-6
    )
    # posterior variance golden formula
    expected_pv = np.clip(betas * (1 - ab_prev) / (1 - ab), 1e-20, None)
    np.testing.assert_allclose(np.asarray(sched.posterior_variance), expected_pv, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_log_variance), np.log(expected_pv), rtol=1e-5
    )
    # posterior mean coefficients sum-to-one sanity: coef1 + coef2*sqrt? No —
    # instead check the DDPM identity coef1 + coef2 ≈ 1 at small t is NOT
    # generally true; check exact formulas instead.
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1),
        betas * np.sqrt(ab_prev) / (1 - ab),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef2),
        (1 - ab_prev) * np.sqrt(alphas) / (1 - ab),
        rtol=1e-5,
    )


def test_extract_shape_value_and_clamping():
    table = jnp.arange(10, dtype=jnp.float32) * 2.0
    t = jnp.array([0, 3, 9])
    out = extract(table, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0.0, 6.0, 18.0])

    # clamping of out-of-range indices (reference clamps, difussion_utils.py:12)
    t_bad = jnp.array([-5, 100])
    out = extract(table, t_bad, 2)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0.0, 18.0])


def test_extract_broadcasting():
    table = jnp.linspace(0.0, 1.0, 100)
    t = jnp.array([10, 50])
    x = jnp.ones((2, 8, 8, 3))
    out = extract(table, t, x.ndim) * x
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out)[0], float(table[10]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1], float(table[50]), rtol=1e-6)


def test_config_roundtrip():
    cfg = DiffusionConfig(T=123, schedule="cosine", dynamic_threshold=0.995, img_size=64)
    assert DiffusionConfig.from_dict(cfg.to_dict()) == cfg
