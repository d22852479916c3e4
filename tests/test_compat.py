"""Cross-sampler consistency (the reference's DDPM-vs-DDIM compat test,
``testing/test_ddim.py:107-142``, strengthened to the exact identity):

For one step t -> t-1 with eta=1 and the same x0_hat and noise, the DDIM
update equals the DDPM ancestral update — sigma^2 collapses to the posterior
variance beta_tilde and the means coincide algebraically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.ops import (
    DiffusionConfig,
    ddim_step,
    make_schedule,
    p_sample_step,
    q_sample,
)

B, R = 2, 8


@pytest.fixture(scope="module")
def sched():
    # clamp off so predict_x0 is identical (no clipping nonlinearity)
    return make_schedule(DiffusionConfig(T=200, clamp_x0=False))


def test_ddim_eta1_single_step_equals_ddpm(sched):
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (B, R, R, 3)) * 0.3
    eps = jax.random.normal(k2, (B, R, R, 3))
    noise = jax.random.normal(k3, (B, R, R, 3))

    eps_fn = lambda x, tt: eps  # consistent model output

    for ti in (1, 50, 150, 199):
        t = jnp.full((B,), ti)
        xt = q_sample(sched, x0, t, eps)
        ddpm = p_sample_step(sched, eps_fn, xt, t, noise, clip_x0=False)
        ddim = ddim_step(
            sched, eps_fn, xt, t, t - 1, noise, eta=1.0, clip_x0=False
        )
        np.testing.assert_allclose(
            np.asarray(ddim), np.asarray(ddpm), atol=5e-4, rtol=1e-3
        )


def test_ddim_sigma_eta1_equals_posterior_variance(sched):
    ab = np.asarray(sched.alphas_cumprod)
    ab_prev = np.asarray(sched.alphas_cumprod_prev)
    betas = np.asarray(sched.betas)
    t = np.arange(1, sched.T)
    sigma2 = (1 - ab_prev[t]) / (1 - ab[t]) * (1 - ab[t] / ab_prev[t])
    beta_tilde = betas[t] * (1 - ab_prev[t]) / (1 - ab[t])
    np.testing.assert_allclose(sigma2, beta_tilde, rtol=1e-3)


def test_full_chains_land_in_same_region(sched):
    """DDPM(T) and DDIM(T, eta=1) chains from the same x_T with a zero-eps
    model both converge to near-zero images (stability sanity)."""
    from ddpm_diffusion_model_tpu.sampling import ddim_sample_loop, ddpm_sample_loop

    eps_fn = lambda x, tt: jnp.zeros_like(x)
    x_init = jax.random.normal(jax.random.key(1), (1, R, R, 3))
    xa, _ = ddpm_sample_loop(sched, eps_fn, x_init, jax.random.key(2))
    xb, _ = ddim_sample_loop(
        sched, eps_fn, x_init, jax.random.key(3),
        timesteps=np.arange(sched.T - 1, -1, -1, dtype=np.int32), eta=1.0,
    )
    assert np.all(np.isfinite(np.asarray(xa)))
    assert np.all(np.isfinite(np.asarray(xb)))
    assert np.abs(np.asarray(xa)).mean() < 10.0
    assert np.abs(np.asarray(xb)).mean() < 10.0
