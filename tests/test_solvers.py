"""DPM-Solver++(2M) tests — coefficient invariants, exact first-order
equivalence with DDIM(eta=0), second-order convergence on an analytic
Gaussian probability-flow ODE, and the grid inference wrapper.

The Gaussian test is the falsifiable one: for x0 ~ N(0, s^2 I) the exact
noise predictor is eps*(x,t) = sqrt(1-ab_t) * x / (ab_t s^2 + 1 - ab_t);
a fine-ladder DDIM chain is the reference ODE solution, and the 2M solver
at 10 steps must land closer to it than first-order DDIM at 10 steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.sampling import (
    ddim_sample_loop,
    dpmpp2m_coefficients,
    dpmpp2m_sample_loop,
    dpmpp2m_sde_coefficients,
    dpmpp2m_sde_sample_loop,
    dpmpp_infer_sample,
)

T = 100
RES = 8


@pytest.fixture(scope="module")
def sched():
    return make_schedule(DiffusionConfig(T=T, schedule="linear", img_size=RES))


@pytest.fixture(scope="module")
def sched_free():
    """clamp_x0=False: predict_x0 clamps INSIDE when sched.clamp_x0 is set
    (the clip_x0 step argument only controls the second clip), and clamping
    breaks the linearity the analytic Gaussian reference relies on."""
    return make_schedule(
        DiffusionConfig(T=T, schedule="linear", img_size=RES, clamp_x0=False))


@pytest.fixture(scope="module")
def tiny():
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(4,), time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=RES,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.key(0), jnp.ones((1, RES, RES, 3)), jnp.zeros((1,))
    )
    return model, params


def _gaussian_eps_fn(sched, s=0.5):
    """Exact noise predictor for x0 ~ N(0, s^2 I)."""
    ab = jnp.asarray(sched.alphas_cumprod)

    def eps_fn(x, t):
        ab_t = ab[t].reshape(-1, *([1] * (x.ndim - 1)))
        return jnp.sqrt(1.0 - ab_t) * x / (ab_t * s**2 + 1.0 - ab_t)

    return eps_fn


# ---------- coefficients ----------

def test_coefficient_invariants(sched):
    ts = np.array([99, 70, 40, 15, 0], dtype=np.int32)
    c_skip, c_lin, corr = dpmpp2m_coefficients(sched, ts)
    assert c_skip.shape == c_lin.shape == corr.shape == (4,)
    # descending ladder: sigma shrinks, so the skip coefficient is in (0, 1)
    assert np.all(c_skip > 0) and np.all(c_skip < 1)
    assert np.all(c_lin > 0)
    assert corr[0] == 0.0  # no previous denoised on the first transition
    assert corr[-1] == 0.0  # lower_order_final default
    assert np.all(corr[1:-1] > 0)
    _, _, corr_full = dpmpp2m_coefficients(sched, ts, lower_order_final=False)
    assert corr_full[-1] > 0


def test_coefficients_reject_degenerate_ladder(sched):
    with pytest.raises(ValueError):
        dpmpp2m_coefficients(sched, np.array([5], dtype=np.int32))


# ---------- first-order step == DDIM(eta=0) ----------

def test_single_transition_equals_ddim_eta0(sched):
    """One DPM-Solver++ transition (correction coeff 0) is algebraically a
    DDIM eta=0 step: alpha_next*e^{-h} = sigma_next*alpha_cur/sigma_cur."""
    eps_fn = lambda x, t: 0.3 * x  # any Lipschitz predictor works
    x0 = jax.random.normal(jax.random.key(1), (4, RES, RES, 3))
    ts = np.array([99, 0], dtype=np.int32)

    out_solver = dpmpp2m_sample_loop(
        sched, eps_fn, x0, timesteps=ts, clip_x0=False)
    out_ddim, _ = ddim_sample_loop(
        sched, eps_fn, x0, jax.random.key(0), timesteps=ts, eta=0.0,
        clip_x0=False)
    np.testing.assert_allclose(
        np.asarray(out_solver), np.asarray(out_ddim), rtol=2e-5, atol=2e-5)


def test_multi_transition_first_order_chain_matches_ddim(sched_free):
    """A chain of first-order transitions (x0_prev reuse disabled, i.e. the
    c_skip/c_lin part alone) must reproduce the DDIM eta=0 chain on the
    same ladder — the step-level identity composed."""
    from ddpm_diffusion_model_tpu.sampling import solvers as S

    eps_fn = _gaussian_eps_fn(sched_free)
    x0 = jax.random.normal(jax.random.key(2), (2, RES, RES, 3))
    ts = np.array([99, 60, 30, 10, 0], dtype=np.int32)

    c_skip, c_lin, _ = S.dpmpp2m_coefficients(sched_free, ts)
    x = x0
    ab = np.asarray(sched_free.alphas_cumprod, np.float64)
    for i in range(len(ts) - 1):
        t = jnp.full((2,), ts[i], jnp.int32)
        eps = eps_fn(x, t)
        ab_t = ab[ts[i]]
        x0_hat = (x - np.sqrt(1 - ab_t) * eps) / np.sqrt(ab_t)
        x = jnp.asarray(c_skip[i] * x + c_lin[i] * x0_hat, jnp.float32)
    out_ddim, _ = ddim_sample_loop(
        sched_free, eps_fn, x0, jax.random.key(0), timesteps=ts, eta=0.0,
        clip_x0=False)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(out_ddim), rtol=5e-5, atol=5e-5)


# ---------- second-order accuracy on the analytic Gaussian ODE ----------
#
# For x0 ~ N(0, s^2 I) the probability-flow ODE is linear and its exact
# flow map is x_a = sqrt(v_a / v_b) * x_b with v_t = ab_t s^2 + 1 - ab_t
# (the linear flow that transports N(0, v_b) to N(0, v_a)).  That analytic
# endpoint is the reference both discrete solvers approximate.

def _gaussian_reference(sched, x_init, s=0.5):
    ab = np.asarray(sched.alphas_cumprod, np.float64)
    v = ab * s**2 + 1.0 - ab
    return np.sqrt(v[0] / v[T - 1]) * np.asarray(x_init)


def test_beats_ddim_on_gaussian_ode(sched_free):
    eps_fn = _gaussian_eps_fn(sched_free)
    x_init = jax.random.normal(jax.random.key(3), (8, RES, RES, 3))
    ref = _gaussian_reference(sched_free, x_init)

    ts = np.round(np.linspace(T - 1, 0, 10)).astype(np.int32)
    coarse_ddim, _ = ddim_sample_loop(
        sched_free, eps_fn, x_init, jax.random.key(0), timesteps=ts, eta=0.0,
        clip_x0=False)
    coarse_solver = dpmpp2m_sample_loop(
        sched_free, eps_fn, x_init, timesteps=ts, clip_x0=False)

    err_ddim = float(np.abs(np.asarray(coarse_ddim) - ref).mean())
    err_solver = float(np.abs(np.asarray(coarse_solver) - ref).mean())
    assert np.isfinite(err_solver)
    # second order should be a lot better, not marginally (measured ~12x)
    assert err_solver < 0.25 * err_ddim, (err_solver, err_ddim)


def test_convergence_with_steps(sched_free):
    eps_fn = _gaussian_eps_fn(sched_free)
    x_init = jax.random.normal(jax.random.key(4), (4, RES, RES, 3))
    ref = _gaussian_reference(sched_free, x_init)
    errs = {}
    for steps in (5, 10, 40):
        ts = np.round(np.linspace(T - 1, 0, steps)).astype(np.int32)
        out = dpmpp2m_sample_loop(
            sched_free, eps_fn, x_init, timesteps=ts, clip_x0=False)
        errs[steps] = float(np.abs(np.asarray(out) - ref).mean())
    assert errs[40] < 0.5 * errs[10] < 0.25 * errs[5], errs
    # headline property: 10 solver steps ~ a full-ladder DDIM chain
    full = np.arange(T - 1, -1, -1, dtype=np.int32)
    ddim_full, _ = ddim_sample_loop(
        sched_free, eps_fn, x_init, jax.random.key(0), timesteps=full,
        eta=0.0, clip_x0=False)
    err_ddim_full = float(np.abs(np.asarray(ddim_full) - ref).mean())
    assert errs[10] < 1.2 * err_ddim_full, (errs, err_ddim_full)


# ---------- model-in-the-loop + inference wrapper ----------

def test_loop_finite_and_deterministic_on_unet(sched, tiny):
    model, params = tiny
    eps_fn = lambda x, t: model.apply(params, x, t)
    x_init = jax.random.normal(jax.random.key(5), (2, RES, RES, 3))
    a = dpmpp2m_sample_loop(sched, eps_fn, x_init, steps=8)
    b = dpmpp2m_sample_loop(sched, eps_fn, x_init, steps=8)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dpmpp_infer_sample_writes_grid(sched, tiny, tmp_path):
    model, params = tiny
    out = tmp_path / "grid_dpmpp.png"
    g1 = dpmpp_infer_sample(
        model, params, sched, n=4, img_size=RES, out_path=str(out),
        steps=6, seed=7)
    assert out.exists()
    g2 = dpmpp_infer_sample(
        model, params, sched, n=4, img_size=RES, out_path=str(out),
        steps=6, seed=7)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    g3 = dpmpp_infer_sample(
        model, params, sched, n=4, img_size=RES, out_path=str(out),
        steps=6, seed=8)
    assert np.abs(np.asarray(g1) - np.asarray(g3)).max() > 1e-4


# ---------- SDE variant ----------

def test_sde_coefficient_invariants(sched):
    ts = np.array([99, 70, 40, 15, 0], dtype=np.int32)
    c_skip, c_lin, corr, c_noise = dpmpp2m_sde_coefficients(sched, ts)
    assert c_skip.shape == c_lin.shape == corr.shape == c_noise.shape == (4,)
    assert np.all(c_skip > 0) and np.all(c_skip < 1)
    assert np.all(c_lin > 0) and np.all(c_noise > 0)
    assert corr[0] == 0.0 and corr[-1] == 0.0
    # the correction coefficient is the SAME h/(2 h_prev) as the ODE variant
    _, _, corr_ode = dpmpp2m_coefficients(sched, ts)
    np.testing.assert_allclose(corr, corr_ode, rtol=1e-6)
    # exact variance transport: c_skip^2 sigma_cur^2 + c_noise^2 = sigma_next^2
    ab = np.asarray(sched.alphas_cumprod, np.float64)[ts]
    sigma = np.sqrt(1.0 - ab)
    np.testing.assert_allclose(
        c_skip.astype(np.float64) ** 2 * sigma[:-1] ** 2
        + c_noise.astype(np.float64) ** 2,
        sigma[1:] ** 2, rtol=1e-5)
    # SDE shrinks the x coefficient by exactly e^{-h} vs the ODE
    c_skip_ode, _, _ = dpmpp2m_coefficients(sched, ts)
    assert np.all(c_skip < c_skip_ode)


def test_sde_exact_delta_marginals(sched_free):
    """For a delta data distribution x0 = c the sampler's per-step transition
    has EXACTLY the true marginal's mean alpha_t c and variance sigma_t^2
    (docstring invariant) at ANY step count — so even a 3-step ladder must
    land on N(alpha_0 c, sigma_0^2)."""
    c = 0.4
    ab = jnp.asarray(sched_free.alphas_cumprod)

    def eps_fn(x, t):
        ab_t = ab[t].reshape(-1, *([1] * (x.ndim - 1)))
        return (x - jnp.sqrt(ab_t) * c) / jnp.sqrt(1.0 - ab_t)

    ab0 = float(np.asarray(sched_free.alphas_cumprod)[0])
    want_mean = np.sqrt(ab0) * c
    want_std = np.sqrt(1.0 - ab0)
    for n_steps, key in ((3, 11), (8, 12)):
        ts = np.round(np.linspace(T - 1, 0, n_steps + 1)).astype(np.int32)
        x_init = jax.random.normal(jax.random.key(key), (4096, 4))
        out = np.asarray(dpmpp2m_sde_sample_loop(
            sched_free, eps_fn, x_init, jax.random.key(key + 100),
            timesteps=ts, clip_x0=False))
        got_mean, got_std = float(out.mean()), float(out.std())
        assert abs(got_mean - want_mean) < 0.01, (n_steps, got_mean, want_mean)
        assert abs(got_std - want_std) / want_std < 0.25, (
            n_steps, got_std, want_std)
        # and the population is actually stochastic, not collapsed to c
        assert got_std > 0.0


def test_sde_determinism_and_key_sensitivity(sched):
    eps_fn = lambda x, t: 0.3 * x
    x_init = jax.random.normal(jax.random.key(6), (2, RES, RES, 3))
    a = dpmpp2m_sde_sample_loop(
        sched, eps_fn, x_init, jax.random.key(0), steps=8)
    b = dpmpp2m_sde_sample_loop(
        sched, eps_fn, x_init, jax.random.key(0), steps=8)
    c = dpmpp2m_sde_sample_loop(
        sched, eps_fn, x_init, jax.random.key(1), steps=8)
    ode = dpmpp2m_sample_loop(sched, eps_fn, x_init, steps=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4
    assert np.abs(np.asarray(a) - np.asarray(ode)).max() > 1e-4


def test_sde_gaussian_marginal_convergence(sched_free):
    """Data N(0, s^2): the final marginal std must approach
    sqrt(ab_0 s^2 + 1 - ab_0), tighter with more steps."""
    s = 0.5
    eps_fn = _gaussian_eps_fn(sched_free, s=s)
    ab0 = float(np.asarray(sched_free.alphas_cumprod)[0])
    want = float(np.sqrt(ab0 * s**2 + 1.0 - ab0))
    errs = {}
    for n_steps in (4, 40):
        ts = np.round(np.linspace(T - 1, 0, n_steps + 1)).astype(np.int32)
        x_init = jax.random.normal(jax.random.key(7), (2048, 8))
        out = np.asarray(dpmpp2m_sde_sample_loop(
            sched_free, eps_fn, x_init, jax.random.key(8),
            timesteps=ts, clip_x0=False))
        errs[n_steps] = abs(float(out.std()) - want) / want
    assert errs[40] < 0.05, errs
    assert errs[40] <= errs[4] + 0.01, errs


def test_dpmpp_infer_sample_sde_writes_grid(sched, tiny, tmp_path):
    model, params = tiny
    out = tmp_path / "grid_dpmpp_sde.png"
    g1 = dpmpp_infer_sample(
        model, params, sched, n=4, img_size=RES, out_path=str(out),
        steps=6, seed=7, sde=True)
    assert out.exists()
    g2 = dpmpp_infer_sample(
        model, params, sched, n=4, img_size=RES, out_path=str(out),
        steps=6, seed=7, sde=True)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    g_ode = dpmpp_infer_sample(
        model, params, sched, n=4, img_size=RES, out_path=str(out),
        steps=6, seed=7)
    assert np.abs(np.asarray(g1) - np.asarray(g_ode)).max() > 1e-4
