"""Diffusion-op tests — q_sample statistics, loss_simple, predict_x0 (incl.
the reference's quirky dynamic thresholding), posterior moments, DDPM and
DDIM single steps.  Coverage mirrors ``testing/test_difussion.py`` and
``testing/test_ddim.py``; golden values computed from closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.ops import (
    DiffusionConfig,
    ddim_step,
    loss_simple,
    make_schedule,
    p_sample_step,
    posterior_mean_variance,
    predict_x0,
    q_sample,
    sample_timesteps,
)

B, H, W, C = 4, 8, 8, 3


@pytest.fixture(scope="module")
def sched():
    return make_schedule(DiffusionConfig(T=1000, schedule="linear", img_size=H))


def test_sample_timesteps_range(sched):
    key = jax.random.key(0)
    t = sample_timesteps(key, 10_000, sched.T)
    t = np.asarray(t)
    assert t.min() >= 1  # t=0 excluded (difussion_class.py:72-78)
    assert t.max() <= sched.T - 1
    # roughly uniform
    assert abs(t.mean() - sched.T / 2) < 25


def test_q_sample_golden(sched):
    x0 = jnp.ones((B, H, W, C))
    eps = jnp.full((B, H, W, C), 0.5)
    t = jnp.array([100] * B)
    out = q_sample(sched, x0, t, eps)
    ab = float(sched.alphas_cumprod[100])
    expected = np.sqrt(ab) * 1.0 + np.sqrt(1 - ab) * 0.5
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


@pytest.mark.parametrize("frac", [0.1, 0.8])
def test_q_sample_statistics(sched, frac):
    # x_t should have mean ~ sqrt(ab)*mean(x0), var ~ ab*var(x0) + (1-ab)
    key = jax.random.key(1)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (256, H, W, C))
    eps = jax.random.normal(k2, (256, H, W, C))
    ti = int(frac * sched.T)
    t = jnp.full((256,), ti)
    xt = np.asarray(q_sample(sched, x0, t, eps))
    ab = float(sched.alphas_cumprod[ti])
    assert abs(xt.mean()) < 0.05
    np.testing.assert_allclose(xt.var(), ab * 1.0 + (1 - ab), rtol=0.1)


def test_loss_simple_zero_for_perfect_model(sched):
    key = jax.random.key(2)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (B, H, W, C))
    noise = jax.random.normal(k2, (B, H, W, C))
    t = jnp.array([10, 100, 500, 900])
    loss = loss_simple(sched, lambda x, tt: noise, x0, t, noise)
    assert float(loss) < 1e-10


def test_loss_simple_unit_for_zero_model(sched):
    # predicting 0 gives E||eps||^2 ≈ 1
    key = jax.random.key(3)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (64, H, W, C))
    noise = jax.random.normal(k2, (64, H, W, C))
    t = jnp.full((64,), 500)
    loss = loss_simple(sched, lambda x, tt: jnp.zeros_like(x), x0, t, noise)
    np.testing.assert_allclose(float(loss), 1.0, rtol=0.1)


def test_loss_simple_weighting(sched):
    key = jax.random.key(4)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (B, H, W, C))
    noise = jax.random.normal(k2, (B, H, W, C))
    t = jnp.full((B,), 100)
    base = float(loss_simple(sched, lambda x, tt: jnp.zeros_like(x), x0, t, noise))
    weighted = float(
        loss_simple(
            sched, lambda x, tt: jnp.zeros_like(x), x0, t, noise,
            weight=jnp.full((B,), 2.0),
        )
    )
    np.testing.assert_allclose(weighted, 2 * base, rtol=1e-5)


def test_predict_x0_inverts_q_sample(sched):
    key = jax.random.key(5)
    k1, k2 = jax.random.split(key)
    x0 = jnp.clip(jax.random.normal(k1, (B, H, W, C)) * 0.5, -1, 1)
    eps = jax.random.normal(k2, (B, H, W, C))
    t = jnp.array([50, 200, 500, 800])
    xt = q_sample(sched, x0, t, eps)
    x0_hat = predict_x0(sched, xt, eps, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)


def test_predict_x0_clamps(sched):
    # large eps error -> x0_hat clamped to [-1, 1] since clamp_x0=True
    xt = jnp.ones((B, H, W, C)) * 10.0
    eps = jnp.zeros_like(xt)
    t = jnp.full((B,), 900)
    x0_hat = np.asarray(predict_x0(sched, xt, eps, t))
    assert x0_hat.max() <= 1.0 and x0_hat.min() >= -1.0


def test_predict_x0_dynamic_threshold_matches_reference_formula():
    sched_dt = make_schedule(
        DiffusionConfig(T=1000, dynamic_threshold=0.995, clamp_x0=True)
    )
    key = jax.random.key(6)
    xt = jax.random.normal(key, (B, H, W, C)) * 3.0
    eps = jnp.zeros_like(xt)
    t = jnp.full((B,), 500)
    got = np.asarray(predict_x0(sched_dt, xt, eps, t))

    # closed-form replication of difussion_class.py:143-149
    ab = float(sched_dt.alphas_cumprod[500])
    raw = np.asarray(xt) / (np.sqrt(ab) + 1e-12)
    amax = np.abs(raw.reshape(B, -1)).max(axis=1)
    amax = np.maximum(amax, 1.0)
    div = np.clip(amax, 0.995, None).reshape(B, 1, 1, 1)
    expected = np.clip(raw / div, -1, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_posterior_moments_golden(sched):
    xt = jnp.ones((B, H, W, C)) * 0.3
    x0 = jnp.ones((B, H, W, C)) * 0.7
    ti = 400
    t = jnp.full((B,), ti)
    mean, var, logvar = posterior_mean_variance(sched, xt, x0, t)
    c1 = float(sched.posterior_mean_coef1[ti])
    c2 = float(sched.posterior_mean_coef2[ti])
    np.testing.assert_allclose(np.asarray(mean), c1 * 0.7 + c2 * 0.3, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(var), float(sched.posterior_variance[ti]), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(logvar), np.log(np.asarray(var)), rtol=1e-5)


def test_p_sample_step_t0_is_deterministic(sched):
    # at t=0 the noise term is masked out
    key = jax.random.key(7)
    k1, k2 = jax.random.split(key)
    xt = jax.random.normal(k1, (B, H, W, C))
    noise_a = jax.random.normal(k2, (B, H, W, C))
    noise_b = -noise_a
    eps_fn = lambda x, tt: jnp.zeros_like(x)
    t = jnp.zeros((B,), dtype=jnp.int32)
    out_a = p_sample_step(sched, eps_fn, xt, t, noise_a)
    out_b = p_sample_step(sched, eps_fn, xt, t, noise_b)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_p_sample_step_stable(sched):
    key = jax.random.key(8)
    k1, k2 = jax.random.split(key)
    xt = jax.random.normal(k1, (B, H, W, C))
    noise = jax.random.normal(k2, (B, H, W, C))
    t = jnp.full((B,), 999)
    out = p_sample_step(sched, lambda x, tt: jnp.zeros_like(x), xt, t, noise)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_eta0_deterministic(sched):
    key = jax.random.key(9)
    xt = jax.random.normal(key, (B, H, W, C))
    t = jnp.full((B,), 500)
    tp = jnp.full((B,), 400)
    eps_fn = lambda x, tt: 0.1 * x
    na = jax.random.normal(jax.random.key(10), xt.shape)
    nb = jax.random.normal(jax.random.key(11), xt.shape)
    out_a = ddim_step(sched, eps_fn, xt, t, tp, na, eta=0.0)
    out_b = ddim_step(sched, eps_fn, xt, t, tp, nb, eta=0.0)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_ddim_eta1_stochastic(sched):
    key = jax.random.key(12)
    xt = jax.random.normal(key, (B, H, W, C))
    t = jnp.full((B,), 500)
    tp = jnp.full((B,), 400)
    eps_fn = lambda x, tt: 0.1 * x
    na = jax.random.normal(jax.random.key(13), xt.shape)
    nb = jax.random.normal(jax.random.key(14), xt.shape)
    out_a = np.asarray(ddim_step(sched, eps_fn, xt, t, tp, na, eta=1.0))
    out_b = np.asarray(ddim_step(sched, eps_fn, xt, t, tp, nb, eta=1.0))
    assert np.abs(out_a - out_b).max() > 1e-3


def test_ddim_golden_formula(sched):
    # verify against the closed-form DDIM update
    xt = jnp.ones((B, H, W, C)) * 0.5
    t = jnp.full((B,), 600)
    tp = jnp.full((B,), 300)
    eps_const = 0.2
    eps_fn = lambda x, tt: jnp.full_like(x, eps_const)
    noise = jnp.zeros_like(xt)
    eta = 0.5
    got = np.asarray(ddim_step(sched, eps_fn, xt, t, tp, noise, eta=eta))

    a_t = float(sched.alphas_cumprod[600])
    a_p = float(sched.alphas_cumprod[300])
    x0 = (0.5 - np.sqrt(1 - a_t) * eps_const) / (np.sqrt(a_t) + 1e-12)
    x0 = np.clip(x0, -1, 1)
    dirv = (0.5 - np.sqrt(a_t) * x0) / np.sqrt(1 - a_t + 1e-12)
    sigma = eta * np.sqrt((1 - a_p) / (1 - a_t + 1e-12)) * np.sqrt(1 - a_t / (a_p + 1e-12))
    expected = np.sqrt(a_p) * x0 + np.sqrt(max(1 - a_p - sigma**2, 0)) * dirv
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_ddim_t_equals_tprev_roundtrip(sched):
    # t -> t with a perfect model should approximately return x_t
    key = jax.random.key(15)
    k1, k2 = jax.random.split(key)
    x0 = jnp.clip(jax.random.normal(k1, (B, H, W, C)) * 0.3, -1, 1)
    eps = jax.random.normal(k2, (B, H, W, C))
    t = jnp.full((B,), 200)
    xt = q_sample(sched, x0, t, eps)
    out = ddim_step(sched, lambda x, tt: eps, xt, t, t, jnp.zeros_like(xt), eta=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xt), atol=1e-3)


def test_ops_jit_and_grad(sched):
    # everything composes under jit + grad (the reference needed @no_grad; we don't)
    key = jax.random.key(16)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (B, H, W, C))
    noise = jax.random.normal(k2, (B, H, W, C))
    t = jnp.full((B,), 123)

    scale = jnp.array(0.5)

    @jax.jit
    def f(s):
        return loss_simple(sched, lambda x, tt: s * x, x0, t, noise)

    g = jax.grad(f)(scale)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
