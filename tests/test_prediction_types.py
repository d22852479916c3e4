"""v- / x0-prediction parameterizations (ops/diffusion.py).

The reference is epsilon-only (``difussion_class.py:95-116``); this framework
adds ``DiffusionConfig.prediction_type in {"epsilon", "v", "x0"}``: training
regresses in the network's NATIVE space, and sampling converts the output
back to eps at the eps_fn boundary — so every sampler (DDPM / DDIM / DPM++ /
cached / sharded) works unchanged under any parameterization.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.ops.diffusion import (
    loss_simple,
    model_output_to_eps,
    prediction_target,
    q_sample,
)
from ddpm_diffusion_model_tpu.ops.schedules import extract

T = 50


def _sched(kind):
    return make_schedule(DiffusionConfig(T=T, img_size=8,
                                         prediction_type=kind))


@pytest.fixture(scope="module")
def xe():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    x0 = jax.random.uniform(k1, (4, 8, 8, 3), minval=-1.0, maxval=1.0)
    eps = jax.random.normal(k2, x0.shape)
    t = jax.random.randint(k3, (4,), 1, T)
    return x0, eps, t


def test_unknown_prediction_type_rejected():
    with pytest.raises(ValueError, match="prediction_type"):
        make_schedule(DiffusionConfig(T=T, prediction_type="score"))


def test_target_and_inverse_are_consistent(xe):
    """model_output_to_eps(prediction_target(...)) == eps for every kind:
    a perfect native-space network yields a perfect eps estimate."""
    x0, eps, t = xe
    for kind in ("epsilon", "v", "x0"):
        s = _sched(kind)
        x_t = q_sample(s, x0, t, eps)
        tgt = prediction_target(s, x0, t, eps)
        back = model_output_to_eps(s, tgt, x_t, t)
        np.testing.assert_allclose(np.asarray(back), np.asarray(eps),
                                   atol=2e-5, err_msg=kind)


def test_v_target_closed_form(xe):
    x0, eps, t = xe
    s = _sched("v")
    a = extract(s.sqrt_alphas_cumprod, t, x0.ndim)
    b = extract(s.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
    np.testing.assert_allclose(
        np.asarray(prediction_target(s, x0, t, eps)),
        np.asarray(a * eps - b * x0), atol=1e-6)


def test_epsilon_schedule_is_backward_compatible(xe):
    """Default kind: target is the noise and the conversion is identity —
    bit-identical to the pre-feature behavior."""
    x0, eps, t = xe
    s = _sched("epsilon")
    assert prediction_target(s, x0, t, eps) is eps
    x_t = q_sample(s, x0, t, eps)
    assert model_output_to_eps(s, eps, x_t, t) is eps


def test_loss_native_space(xe):
    """A network that outputs the exact native target has zero loss; the
    v-pred loss of an epsilon-perfect network is NOT zero (the regression
    really runs in v space)."""
    x0, eps, t = xe
    for kind in ("epsilon", "v", "x0"):
        s = _sched(kind)
        perfect = lambda x_t, tt: prediction_target(s, x0, tt, eps)
        assert float(loss_simple(s, perfect, x0, t, eps)) < 1e-10
    sv = _sched("v")
    eps_net = lambda x_t, tt: eps  # perfect in eps space
    assert float(loss_simple(sv, eps_net, x0, t, eps)) > 1e-3


@pytest.mark.parametrize("kind", ["v", "x0"])
def test_oracle_sampler_equivalence(kind):
    """Full DDIM ladder: sampling with a native-space oracle network under
    prediction_type=kind equals sampling with the equivalent eps oracle
    under epsilon — the conversion at the eps_fn boundary is exact through
    the whole loop."""
    from ddpm_diffusion_model_tpu.sampling.loops import ddim_sample_loop
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule

    se = _sched("epsilon")
    sk = _sched(kind)

    # a fixed nonlinear "network" in eps space
    def f_eps(x, t):
        tt = extract(se.alphas_cumprod, t, x.ndim)
        return jnp.tanh(x) * (0.5 + tt)

    # its exact native-space counterpart: invert model_output_to_eps
    def f_native(x, t):
        e = f_eps(x, t)
        a = extract(sk.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(sk.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        if kind == "v":
            return (e - b * x) / a  # eps = a v + b x  =>  v
        return (x - b * e) / (a + 1e-12)  # x0

    def wrapped(x, t):
        return model_output_to_eps(sk, f_native(x, t), x, t)

    x_init = jax.random.normal(jax.random.key(3), (2, 8, 8, 3))
    ts = build_ddim_schedule("t_linear", 10, T)
    key = jax.random.key(7)
    ref, _ = ddim_sample_loop(se, f_eps, x_init, key, timesteps=ts, eta=0.0)
    got, _ = ddim_sample_loop(sk, wrapped, x_init, key, timesteps=ts, eta=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cfg_eps_fn_converts_after_combine():
    """cfg_eps_fn(sched=v-sched) on a conditional model returns a CFG-
    combined output CONVERTED to eps: equals hand-combining the two native
    branches then converting."""
    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
    from ddpm_diffusion_model_tpu.sampling.inference import cfg_eps_fn

    s = _sched("v")
    cfg = UNetConfig(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), time_embed_dim=16, num_heads=1,
                     head_dim=8, img_resolution=8, num_classes=3)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.ones((1, 8, 8, 3)),
                        jnp.zeros((1,)))
    y = jnp.array([0, 2], jnp.int32)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    t = jnp.array([7, 31], jnp.int32)
    w = 2.5
    got = cfg_eps_fn(model, params, y, w, sched=s)(x, t)
    v_c = model.apply(params, x, t, y=y)
    v_u = model.apply(params, x, t, y=jnp.full_like(y, 3))
    v = v_u + w * (v_c - v_u)
    want = model_output_to_eps(s, v, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_train_step_v_prediction_learns():
    """A real donated train step under prediction_type='v': loss is finite,
    decreases over a few steps, and params move."""
    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
    from ddpm_diffusion_model_tpu.training.state import (
        TrainConfig, init_train_state, make_optimizer)
    from ddpm_diffusion_model_tpu.training.step import make_train_step

    s = _sched("v")
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


def test_weighting_native_conversion_closed_form(xe):
    """Named weightings are eps-space definitions converted to the native
    space: under v, min_snr_5 is exactly the Min-SNR paper's
    min(SNR,5)/(SNR+1); under x0 it is min(SNR,5)."""
    from ddpm_diffusion_model_tpu.training.step import resolve_weight_fn

    _, _, t = xe
    w = resolve_weight_fn("min_snr_5")
    ab = np.asarray(_sched("v").alphas_cumprod)[np.asarray(t)]
    snr = ab / (1.0 - ab)
    np.testing.assert_allclose(np.asarray(w(t, _sched("v"))),
                               np.minimum(snr, 5.0) / (snr + 1.0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w(t, _sched("x0"))),
                               np.minimum(snr, 5.0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w(t, _sched("epsilon"))),
                               np.minimum(snr, 5.0) / snr, rtol=1e-4)


@pytest.mark.parametrize("name", ["snr", "p2", "min_snr_5"])
@pytest.mark.parametrize("kind", ["v", "x0"])
def test_weighted_loss_matches_eps_space_objective(xe, name, kind):
    """Exact identity: the converted weight makes the native-space weighted
    loss equal the eps-space weighted loss of the SAME predictor — at fixed
    (x_t, t), err_native is err_eps times a known factor, and the conversion
    cancels it."""
    from ddpm_diffusion_model_tpu.training.step import resolve_weight_fn

    x0, eps, t = xe
    se, sk = _sched("epsilon"), _sched(kind)
    w = resolve_weight_fn(name)

    # one fixed imperfect predictor, expressed in each native space
    def f_eps(x_t, tt):
        return jnp.tanh(x_t) * 0.7

    def f_native(x_t, tt):
        e = f_eps(x_t, tt)
        a = extract(sk.sqrt_alphas_cumprod, tt, x_t.ndim)
        b = extract(sk.sqrt_one_minus_alphas_cumprod, tt, x_t.ndim)
        if kind == "v":
            return (e - b * x_t) / a
        return (x_t - b * e) / (a + 1e-12)

    le = loss_simple(se, f_eps, x0, t, eps, weight=w(t, se))
    lk = loss_simple(sk, f_native, x0, t, eps, weight=w(t, sk))
    np.testing.assert_allclose(float(lk), float(le), rtol=2e-4)


def test_config_roundtrip_and_legacy_default():
    d = DiffusionConfig(T=10, prediction_type="v").to_dict()
    assert DiffusionConfig.from_dict(d).prediction_type == "v"
    legacy = {k: v for k, v in d.items() if k != "prediction_type"}
    assert DiffusionConfig.from_dict(legacy).prediction_type == "epsilon"
