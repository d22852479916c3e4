"""Flow matching / rectified flow (``schedule="rf"`` + ``prediction_type=
"flow"``).

The reference has neither flow matching nor any non-epsilon objective; this
framework implements rectified flow (Liu et al. 2023, the SD3/Flux family)
through the standard schedule/parameterization machinery: the linear
interpolant x_s = (1-s) x0 + s eps is a variance-preserving diffusion after
dividing by c_s = sqrt((1-s)^2 + s^2) (``ops/schedules.py
beta_schedule_rf``), and the velocity target u = eps - x0 is just another
affine parameterization at the eps_fn boundary (``ops/diffusion.py``) — so
every sampler, CFG, weighting, and the likelihood bound work unchanged.
The load-bearing proof here: DDIM(eta=0) on the rf schedule IS Euler
integration of the rectified flow, step for step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.ops import (
    DiffusionConfig,
    beta_schedule_rf,
    make_schedule,
)
from ddpm_diffusion_model_tpu.ops.diffusion import (
    ddim_step,
    loss_simple,
    model_output_to_eps,
    prediction_target,
    q_sample,
)
from ddpm_diffusion_model_tpu.ops.schedules import extract

T = 50


def _sched(schedule="rf", kind="flow", **kw):
    return make_schedule(DiffusionConfig(
        T=T, schedule=schedule, prediction_type=kind, img_size=8,
        clamp_x0=False, **kw))


def _s_of_t(t):
    """The interpolant time the rf schedule discretizes: s_t = (t+1)/(T+1)."""
    return (np.asarray(t, np.float64) + 1.0) / (T + 1.0)


@pytest.fixture(scope="module")
def xe():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    x0 = jax.random.uniform(k1, (4, 8, 8, 3), minval=-1.0, maxval=1.0)
    eps = jax.random.normal(k2, x0.shape)
    t = jax.random.randint(k3, (4,), 1, T)
    return x0, eps, t


def test_rf_schedule_closed_form():
    """alpha_bar matches the interpolant-to-VP rescaling exactly (no beta
    clipping binds at any T in the supported range), is strictly monotone,
    and the SNR is the rectified-flow ((1-s)/s)^2."""
    for n in (T, 1000):
        betas = beta_schedule_rf(n)
        ab = np.cumprod(1.0 - np.asarray(betas, np.float64))
        s = (np.arange(n) + 1.0) / (n + 1.0)
        want = (1.0 - s) ** 2 / ((1.0 - s) ** 2 + s**2)
        np.testing.assert_allclose(ab, want, rtol=1e-4)
        assert (np.diff(ab) < 0).all()
        assert ab[0] > 0.99 and ab[-1] < 1e-3
        snr = ab / (1.0 - ab)
        np.testing.assert_allclose(snr, ((1.0 - s) / s) ** 2, rtol=1e-4)


def test_flow_target_closed_form(xe):
    """u = eps - x0, independent of t."""
    x0, eps, t = xe
    s = _sched()
    np.testing.assert_allclose(
        np.asarray(prediction_target(s, x0, t, eps)),
        np.asarray(eps - x0), atol=1e-6)


def test_flow_target_and_inverse_are_consistent(xe):
    """A perfect velocity network yields a perfect eps estimate — on the rf
    schedule and on a plain linear schedule (the parameterization does not
    assume the schedule)."""
    x0, eps, t = xe
    for schedule in ("rf", "linear"):
        s = _sched(schedule=schedule)
        x_t = q_sample(s, x0, t, eps)
        back = model_output_to_eps(s, prediction_target(s, x0, t, eps),
                                   x_t, t)
        np.testing.assert_allclose(np.asarray(back), np.asarray(eps),
                                   atol=3e-5, err_msg=schedule)


def test_cfg_combine_convert_commute(xe):
    """The flow->eps conversion is affine in the output at fixed (x_t, t),
    so CFG combining before or after conversion is identical."""
    x0, eps, t = xe
    s = _sched()
    x_t = q_sample(s, x0, t, eps)
    k1, k2 = jax.random.split(jax.random.key(9))
    u_c = jax.random.normal(k1, x0.shape)
    u_u = jax.random.normal(k2, x0.shape)
    w = 3.0
    pre = model_output_to_eps(s, u_u + w * (u_c - u_u), x_t, t)
    post = (model_output_to_eps(s, u_u, x_t, t)
            + w * (model_output_to_eps(s, u_c, x_t, t)
                   - model_output_to_eps(s, u_u, x_t, t)))
    np.testing.assert_allclose(np.asarray(pre), np.asarray(post),
                               rtol=1e-5, atol=1e-5)


def test_ddim_on_rf_is_euler_flow():
    """THE equivalence: for delta data at x0* (exact predictor), one
    DDIM(eta=0) step t -> t' on the rf schedule equals one Euler step of
    the rectified-flow ODE dx/ds = u(x, s) from s_t to s_t' — after
    rescaling by c_s = sqrt((1-s)^2 + s^2) (the VP normalization).  Checked
    along a whole descending ladder, step for step."""
    sched = _sched(kind="epsilon")  # oracle works directly in eps space
    x_star = jax.random.uniform(jax.random.key(1), (2, 8, 8, 3),
                                minval=-1.0, maxval=1.0)

    def oracle_eps(x, t):
        a = extract(sched.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return (x - a * x_star) / b

    ladder = [45, 36, 27, 18, 9, 2]
    t0 = ladder[0]

    def c_of(t):
        s = _s_of_t(t)
        return np.sqrt((1.0 - s) ** 2 + s**2)

    # shared start: DDIM state x_t0; flow state is its unscaled counterpart
    x = jax.random.normal(jax.random.key(2), x_star.shape)
    z = np.asarray(x, np.float64) * c_of(t0)
    zero = jnp.zeros_like(x)
    for t_hi, t_lo in zip(ladder[:-1], ladder[1:]):
        tb = jnp.full((2,), t_hi, jnp.int32)
        tp = jnp.full((2,), t_lo, jnp.int32)
        x = ddim_step(sched, oracle_eps, x, tb, tp, zero, eta=0.0,
                      clip_x0=False)
        # literal rectified-flow Euler: u(z, s) = (z - x0*)/s for delta data
        s_hi, s_lo = _s_of_t(t_hi), _s_of_t(t_lo)
        z = z + (s_lo - s_hi) * (z - np.asarray(x_star, np.float64)) / s_hi
        np.testing.assert_allclose(np.asarray(x, np.float64) * c_of(t_lo), z,
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"step {t_hi}->{t_lo}")


def test_oracle_sampler_equivalence_flow():
    """Full DDIM ladder: a native-space velocity oracle under
    prediction_type='flow' samples identically to the equivalent eps oracle
    under 'epsilon' (same rf tables)."""
    from ddpm_diffusion_model_tpu.sampling.loops import ddim_sample_loop
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule

    se = _sched(kind="epsilon")
    sf = _sched(kind="flow")

    def f_eps(x, t):
        tt = extract(se.alphas_cumprod, t, x.ndim)
        return jnp.tanh(x) * (0.5 + tt)

    def f_flow(x, t):
        e = f_eps(x, t)
        a = extract(sf.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(sf.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return ((a + b) * e - x) / a  # invert eps = (x + a u)/(a + b)

    def wrapped(x, t):
        return model_output_to_eps(sf, f_flow(x, t), x, t)

    x_init = jax.random.normal(jax.random.key(3), (2, 8, 8, 3))
    ts = build_ddim_schedule("t_linear", 10, T)
    key = jax.random.key(7)
    ref, _ = ddim_sample_loop(se, f_eps, x_init, key, timesteps=ts, eta=0.0,
                              clip_x0=False)
    got, _ = ddim_sample_loop(sf, wrapped, x_init, key, timesteps=ts,
                              eta=0.0, clip_x0=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dpmpp_on_rf_schedule_runs():
    """The multistep ODE solver consumes the rf schedule's log-SNR grid
    without special cases: finite, deterministic output."""
    from ddpm_diffusion_model_tpu.sampling.solvers import dpmpp2m_sample_loop
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule

    sched = _sched(kind="epsilon")
    x_star = jax.random.uniform(jax.random.key(4), (2, 8, 8, 3),
                                minval=-1.0, maxval=1.0)

    def oracle_eps(x, t):
        a = extract(sched.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return (x - a * x_star) / b

    ts = build_ddim_schedule("t_linear", 8, T)
    x_init = jax.random.normal(jax.random.key(5), x_star.shape)
    out1 = dpmpp2m_sample_loop(sched, oracle_eps, x_init,
                               timesteps=np.asarray(ts, np.int32),
                               clip_x0=False)
    out2 = dpmpp2m_sample_loop(sched, oracle_eps, x_init,
                               timesteps=np.asarray(ts, np.int32),
                               clip_x0=False)
    assert np.isfinite(np.asarray(out1)).all()
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # exact predictor: the ODE endpoint recovers the delta-data mode
    np.testing.assert_allclose(np.asarray(out1), np.asarray(x_star),
                               atol=0.15)


def test_loss_native_space_flow(xe):
    """A perfect-velocity network has zero flow loss; a perfect-EPS network
    does not (the regression really runs in velocity space)."""
    x0, eps, t = xe
    s = _sched()
    perfect = lambda x_t, tt: prediction_target(s, x0, tt, eps)
    assert float(loss_simple(s, perfect, x0, t, eps)) < 1e-10
    eps_net = lambda x_t, tt: eps
    assert float(loss_simple(s, eps_net, x0, t, eps)) > 1e-3


def test_train_step_flow_learns():
    """A real donated train step under schedule='rf', prediction_type=
    'flow': loss finite and decreasing."""
    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
    from ddpm_diffusion_model_tpu.training.state import (
        TrainConfig, init_train_state, make_optimizer)
    from ddpm_diffusion_model_tpu.training.step import make_train_step

    s = _sched()
    cfg = UNetConfig(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), time_embed_dim=16, num_heads=1,
                     head_dim=8, img_resolution=8)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.ones((1, 8, 8, 3)),
                        jnp.zeros((1,)))
    tc = TrainConfig(base_lr=1e-3, warmup_steps=1, grad_accum_steps=1)
    tx = make_optimizer(tc)
    state, _ = init_train_state(params, tc, tx=tx)
    step = make_train_step(model, s, tx, tc)
    x = jax.random.uniform(jax.random.key(1), (8, 8, 8, 3),
                           minval=-1.0, maxval=1.0)
    losses = []
    for _ in range(8):
        state, metrics = step(state, x)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_weighting_flow_conversion_closed_form(xe):
    """min_snr_5 under flow: w_eps * ab / (sqrt(ab) + sqrt(1-ab))^2."""
    from ddpm_diffusion_model_tpu.training.step import resolve_weight_fn

    _, _, t = xe
    s = _sched()
    w = resolve_weight_fn("min_snr_5")
    ab = np.asarray(s.alphas_cumprod)[np.asarray(t)]
    snr = ab / (1.0 - ab)
    w_eps = np.minimum(snr, 5.0) / snr
    want = w_eps * ab / (np.sqrt(ab) + np.sqrt(1.0 - ab)) ** 2
    np.testing.assert_allclose(np.asarray(w(t, s)), want, rtol=1e-5)


def test_likelihood_scores_flow_identically():
    """The variational bound rides the same eps boundary: a flow-native
    oracle scores the same bits/dim as its eps-space equivalent."""
    from ddpm_diffusion_model_tpu.ops.likelihood import vlb_bits_per_dim_mc

    se = _sched(kind="epsilon")
    sf = _sched(kind="flow")
    x0 = jnp.round((jax.random.uniform(jax.random.key(6), (2, 8, 8, 3))
                    * 255.0)) / 127.5 - 1.0

    def f_eps(x, t):
        tt = extract(se.alphas_cumprod, t, x.ndim)
        return jnp.tanh(x) * (0.5 + tt)

    def eps_via_flow(x, t):
        e = f_eps(x, t)
        a = extract(sf.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(sf.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        u = ((a + b) * e - x) / a
        return model_output_to_eps(sf, u, x, t)

    key = jax.random.key(12)
    bpd_e = np.asarray(vlb_bits_per_dim_mc(se, f_eps, x0, key, num_t=16))
    bpd_f = np.asarray(vlb_bits_per_dim_mc(sf, eps_via_flow, x0, key,
                                           num_t=16))
    np.testing.assert_allclose(bpd_f, bpd_e, rtol=1e-4, atol=1e-4)


def test_config_roundtrip_and_rejects():
    d = DiffusionConfig(T=T, schedule="rf", prediction_type="flow",
                        clamp_x0=False).to_dict()
    c = DiffusionConfig.from_dict(d)
    assert c.schedule == "rf" and c.prediction_type == "flow"
    with pytest.raises(ValueError, match="schedule"):
        make_schedule(DiffusionConfig(T=T, schedule="rectified"))
