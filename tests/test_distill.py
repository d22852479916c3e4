"""Progressive distillation (training/distill.py).

The reference has no distillation (its fastest sampler is DDIM-50,
``ddpim_inference.py:19-21``); these tests pin the algebra (the one-step
target exactly inverts the eta=0 DDIM step), the phase machinery (ladder
halving, student ladder == the standard "linear" DDIM ladder), and that a
distillation phase actually reduces the distillation loss on a tiny model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models.unet import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.ops.diffusion import (
    ddim_step,
    prediction_target,
    q_sample,
)
from ddpm_diffusion_model_tpu.ops.schedules import extract
from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule
from ddpm_diffusion_model_tpu.training import TrainConfig
from ddpm_diffusion_model_tpu.training.distill import (
    _distill_weight,
    distill_ladder,
    make_distill_step,
    onestep_target,
    progressive_distill,
    student_timesteps,
    student_x0,
)
from ddpm_diffusion_model_tpu.training.state import init_train_state, make_optimizer

T = 100
RES = 8


@pytest.fixture(scope="module")
def sched_free():
    """clamp_x0=False so predict_x0 is linear and the inversion is exact."""
    return make_schedule(DiffusionConfig(T=T, img_size=RES, clamp_x0=False))


@pytest.fixture(scope="module")
def tiny():
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
        dropout=0.0, img_resolution=RES,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.key(0), jnp.ones((1, RES, RES, 3)), jnp.zeros((1,)))
    return model, params


@pytest.fixture(scope="module")
def tiny_cond():
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
        dropout=0.0, img_resolution=RES, num_classes=3,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.key(0), jnp.ones((1, RES, RES, 3)), jnp.zeros((1,)))
    return model, params


# ---------- ladders ----------

def test_ladder_shape_and_student_subsample():
    for N in (2, 4, 8, 25):
        lad = distill_ladder(T, N)
        assert lad.shape == (2 * N + 1,)
        assert lad[0] == T - 1 and lad[-1] == 0
        assert np.all(np.diff(lad) < 0)
        np.testing.assert_array_equal(
            student_timesteps(lad), build_ddim_schedule("linear", N, T),
            err_msg="student ladder must be the standard 'linear' DDIM "
                    "ladder so sample-ddim --kind linear replays it")


def test_ladder_rejects_degenerate():
    with pytest.raises(ValueError):
        distill_ladder(T, 0)
    with pytest.raises(ValueError):
        distill_ladder(T, T)  # 2N+1 > T


# ---------- the one-step target inverts the real sampler ----------

def test_onestep_target_inverts_ddim_step(sched_free):
    """Target algebra: the x0 recovered from any two-step landing point,
    fed back through ONE real ddim_step as an oracle eps, reproduces that
    landing point exactly."""
    s = sched_free
    key = jax.random.key(1)
    x = jax.random.normal(key, (4, RES, RES, 3))
    # any smooth predictor works; exactness is an algebraic property
    eps_fn = lambda z, t: 0.4 * z
    t = jnp.array([90, 61, 33, 12], jnp.int32)
    tm = jnp.array([70, 45, 20, 6], jnp.int32)
    tn = jnp.array([50, 30, 9, 0], jnp.int32)
    zero = jnp.zeros_like(x)

    z_mid = ddim_step(s, eps_fn, x, t, tm, zero, eta=0.0, clip_x0=False)
    z_next = ddim_step(s, eps_fn, z_mid, tm, tn, zero, eta=0.0, clip_x0=False)
    x_tilde = onestep_target(s, x, t, tn, z_next)

    # oracle student: the eps whose predict_x0 is exactly x_tilde
    a = extract(s.sqrt_alphas_cumprod, t, x.ndim)
    sig = extract(s.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    oracle_eps = (x - a * x_tilde) / (sig + 1e-12)
    z_one = ddim_step(s, lambda z, tt: oracle_eps, x, t, tn, zero,
                      eta=0.0, clip_x0=False)
    np.testing.assert_allclose(np.asarray(z_one), np.asarray(z_next),
                               rtol=2e-4, atol=2e-4)


def test_final_segment_target_near_znext(sched_free):
    """At t_next = 0 the inversion degenerates to ~z_next (a''~1, ratio~0)."""
    s = sched_free
    x = jax.random.normal(jax.random.key(2), (2, RES, RES, 3))
    z_next = jax.random.normal(jax.random.key(3), (2, RES, RES, 3))
    t = jnp.array([40, 40], jnp.int32)
    tn = jnp.zeros((2,), jnp.int32)
    x_tilde = onestep_target(s, x, t, tn, z_next)
    # ratio = sqrt((1-ab_0)/(1-ab_t)) ~ 0.02 leaks that much of z_t through
    np.testing.assert_allclose(np.asarray(x_tilde), np.asarray(z_next),
                               atol=0.15)


# ---------- student output conversion + weighting ----------

def test_student_x0_inverts_prediction_target(sched_free):
    """A network outputting the exact native target has x0 estimate == x0."""
    k1, k2 = jax.random.split(jax.random.key(4))
    x0 = jax.random.uniform(k1, (4, RES, RES, 3), minval=-1, maxval=1)
    eps = jax.random.normal(k2, x0.shape)
    t = jnp.array([80, 50, 20, 5], jnp.int32)
    for kind in ("epsilon", "v", "x0", "flow"):
        kw = {"schedule": "rf", "clamp_x0": False} if kind == "flow" else {}
        s = make_schedule(DiffusionConfig(T=T, img_size=RES,
                                          prediction_type=kind, **kw))
        z = q_sample(s, x0, t, eps)
        out = prediction_target(s, x0, t, eps)
        np.testing.assert_allclose(
            np.asarray(student_x0(s, out, z, t)), np.asarray(x0),
            atol=3e-5, err_msg=kind)


def test_distill_weight_forms(sched_free):
    t = jnp.array([0, 10, 50, 99], jnp.int32)
    ab = np.asarray(sched_free.alphas_cumprod)[np.asarray(t)]
    snr = ab / (1 - ab)
    np.testing.assert_allclose(
        np.asarray(_distill_weight(sched_free, t, "snr")), snr, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(_distill_weight(sched_free, t, "truncated_snr")),
        np.maximum(snr, 1.0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(_distill_weight(sched_free, t, "uniform")),
        np.ones(4), rtol=0)
    with pytest.raises(ValueError):
        _distill_weight(sched_free, t, "nope")


# ---------- the distillation step ----------

def _toy_batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.clip(rng.normal(size=(n, RES, RES, 3)) * 0.3, -1, 1),
        jnp.float32)


def test_distill_step_reduces_loss(tiny, sched_free):
    """A student initialized AWAY from the teacher converges toward it (a
    student initialized AT the teacher starts near-zero already — the
    residual is only the teacher's own 1-vs-2-step gap)."""
    model, teacher = tiny
    student0 = model.init(
        jax.random.key(7), jnp.ones((1, RES, RES, 3)), jnp.zeros((1,)))
    cfg = TrainConfig(base_lr=2e-3, warmup_steps=0, ema_decay=0.9,
                      flat_optimizer=False)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(student0, cfg, tx=tx)
    step = make_distill_step(model, sched_free, distill_ladder(T, 4), tx, cfg,
                             weighting="uniform")
    batch = _toy_batch()
    losses = []
    for _ in range(40):
        state, m = step(state, teacher, batch)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    head, tail = np.mean(losses[:5]), np.mean(losses[-5:])
    assert tail < 0.5 * head, (head, tail, losses[::8])


def test_distill_step_conditional_and_cfg(tiny_cond, sched_free):
    model, params = tiny_cond
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=0, flat_optimizer=False)
    tx = make_optimizer(cfg)
    y = jnp.array([0, 1, 2, 0, 1, 2, 0, 1], jnp.int32)
    batch = (_toy_batch(), y)
    for guidance in (None, 1.0, 2.0):
        state, _ = init_train_state(params, cfg, tx=tx)
        step = make_distill_step(model, sched_free, distill_ladder(T, 4),
                                 tx, cfg, guidance=guidance)
        state, m = step(state, teacher_params=params, batch=batch)
        assert np.isfinite(float(m["loss"])), f"guidance={guidance}"


def test_distill_step_rejects_bad_ladder(tiny, sched_free):
    model, _ = tiny
    cfg = TrainConfig(flat_optimizer=False)
    tx = make_optimizer(cfg)
    with pytest.raises(ValueError, match="ladder"):
        make_distill_step(model, sched_free,
                          np.array([50, 25, 10, 0]), tx, cfg)  # even length


# ---------- the phase driver ----------

def test_progressive_distill_phases(tiny, sched_free):
    model, params = tiny
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=0, flat_optimizer=False)
    logs = []
    out, info = progressive_distill(
        model, sched_free, params,
        make_batches=lambda: [_toy_batch(seed=s) for s in range(2)],
        start_steps=8, end_steps=2, phase_updates=3, cfg=cfg,
        weighting="uniform", log=logs.append)
    assert [p["student_steps"] for p in info["phases"]] == [4, 2]
    assert info["steps"] == 2
    assert all(np.isfinite(p["last_loss"]) for p in info["phases"])
    assert jax.tree.structure(out) == jax.tree.structure(params)
    assert logs  # progress was reported
    # teacher params were not mutated/donated away
    assert np.isfinite(float(jax.tree.leaves(params)[0].sum()))


def test_cli_distill_roundtrip(tmp_path, capsys):
    """train -> distill -> sample the student with the ladder the distill
    command prints (schedule linear, --to-steps)."""
    import json as _json
    import os

    from ddpm_diffusion_model_tpu.cli import main
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig, get_preset

    base = get_preset("celeba64_low")
    tiny_exp = ExperimentConfig(
        model=base.model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=base.diffusion.__class__(T=20, img_size=8),
        train=base.train.__class__(base_lr=1e-3, warmup_steps=2),
        run_name="distcli", img_size=8, batch_size=4, epochs=1,
        sample_every=10, save_every=1,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny_exp.to_json())

    ckpt_dir = str(tmp_path / "ck")
    main(["train", "--config", cfg_path, "--data", "synthetic",
          "--synthetic-size", "16", "--ckpt-dir", ckpt_dir, "--no-samples"])
    capsys.readouterr()
    last = os.path.join(ckpt_dir, "distcli_last")

    student = str(tmp_path / "student")
    main(["distill", "--config", cfg_path, "--ckpt", last, "--ema",
          "--out", student, "--data", "synthetic", "--synthetic-size", "16",
          "--start-steps", "8", "--to-steps", "4", "--phase-updates", "2"])
    out = capsys.readouterr().out
    payload = _json.loads(out.splitlines()[-2])
    assert payload["steps"] == 4
    assert [p["student_steps"] for p in payload["phases"]] == [4]
    assert os.path.isdir(student)

    png = str(tmp_path / "student4.png")
    main(["sample-ddim", "--config", cfg_path, "--ckpt", student,
          "--n", "4", "--steps", "4", "--schedule", "linear",
          "--out", png, "--ema"])
    assert os.path.exists(png)


def test_progressive_distill_bakes_guidance_once(tiny_cond, sched_free,
                                                 monkeypatch):
    """CFG is baked into the FIRST student only (Meng et al. 2023 stage 1);
    later phases' teachers already emit guided eps, so re-applying w there
    would amplify guidance w-fold per halving."""
    import ddpm_diffusion_model_tpu.training.distill as D

    model, params = tiny_cond
    seen = []
    real = D.make_distill_step

    def spy(*args, **kwargs):
        seen.append(kwargs.get("guidance"))
        return real(*args, **kwargs)

    monkeypatch.setattr(D, "make_distill_step", spy)
    y = jnp.array([0, 1, 2, 0, 1, 2, 0, 1], jnp.int32)
    D.progressive_distill(
        model, sched_free, params,
        make_batches=lambda: [(_toy_batch(), y)],
        start_steps=8, end_steps=2, phase_updates=1,
        cfg=TrainConfig(base_lr=1e-3, warmup_steps=0, flat_optimizer=False),
        guidance=2.0, log=None)
    assert seen == [2.0, None]


def test_progressive_distill_rejects_short_start(tiny, sched_free):
    model, params = tiny
    with pytest.raises(ValueError, match="start_steps"):
        progressive_distill(
            model, sched_free, params, make_batches=lambda: [_toy_batch()],
            start_steps=4, end_steps=4, phase_updates=1,
            cfg=TrainConfig(flat_optimizer=False))
