"""Consistency distillation (training/consistency.py).

The reference has no few-NFE family (fastest sampler: DDIM-50,
``ddpim_inference.py:19-21``).  These tests pin the boundary condition
(f(z_0, 0) == z_0 architecturally), the scalings, the CD step mechanics
(EMA target network, loss decreases on a tiny model), and the 1/N-step
sampler (shape, determinism, jit-composability, conditional path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models.unet import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.ops.diffusion import q_sample
from ddpm_diffusion_model_tpu.training import TrainConfig
from ddpm_diffusion_model_tpu.training.consistency import (
    consistency_distill,
    consistency_fn,
    consistency_ladder,
    consistency_sample_loop,
    consistency_scalings,
    make_consistency_step,
)
from ddpm_diffusion_model_tpu.training.state import init_train_state, make_optimizer

T = 100
RES = 8


@pytest.fixture(scope="module")
def sched():
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
        jax.random.key(0), jnp.ones((1, RES, RES, 3)), jnp.zeros((1,)),
        y=jnp.zeros((1,), jnp.int32))
    return model, params


# ---------- ladder + scalings ----------

def test_ladder_endpoints_and_monotone():
    for N in (1, 2, 4, 50):
        lad = consistency_ladder(T, N)
        assert lad.shape == (N + 1,)
        assert lad[0] == T - 1 and lad[-1] == 0
        assert np.all(np.diff(lad) < 0)
    with pytest.raises(ValueError):
        consistency_ladder(T, 0)
    with pytest.raises(ValueError):
        consistency_ladder(T, T)


def test_scalings_boundary_and_decay():
    t = jnp.array([0, 1, 10, T - 1], jnp.int32)
    c_skip, c_out = consistency_scalings(t)
    # exact boundary at t=0
    assert float(c_skip[0]) == 1.0 and float(c_out[0]) == 0.0
    # c_skip strictly decreasing, c_out strictly increasing in t
    assert np.all(np.diff(np.asarray(c_skip)) < 0)
    assert np.all(np.diff(np.asarray(c_out)) > 0)
    # far from the boundary the network dominates
    assert float(c_skip[-1]) < 1e-4 and float(c_out[-1]) > 0.999


def test_boundary_condition_exact(sched, tiny):
    """f(z, 0) == z regardless of what the network outputs."""
    model, params = tiny
    z = jax.random.normal(jax.random.key(1), (4, RES, RES, 3))
    t0 = jnp.zeros((4,), jnp.int32)
    f = consistency_fn(model, params, sched, z, t0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(z), rtol=0, atol=0)


def test_consistency_fn_matches_manual_combination(sched, tiny):
    """f == c_skip*z + c_out*x0_hat with the network's native-space x0."""
    from ddpm_diffusion_model_tpu.training.distill import student_x0

    model, params = tiny
    z = jax.random.normal(jax.random.key(2), (3, RES, RES, 3))
    t = jnp.array([5, 40, 90], jnp.int32)
    out = model.apply(params, z, t).astype(jnp.float32)
    x0_hat = student_x0(sched, out, z, t)
    c_skip, c_out = consistency_scalings(t)
    want = (c_skip[:, None, None, None] * z
            + c_out[:, None, None, None] * x0_hat)
    got = consistency_fn(model, params, sched, z, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


# ---------- the CD step ----------

def _blob_batch(key, n=8):
    """Tiny synthetic 'dataset': axis-aligned gaussians in [-1, 1]."""
    ky, kx = jax.random.split(key)
    yy, xx = jnp.mgrid[0:RES, 0:RES]
    cy = jax.random.uniform(ky, (n, 1, 1), minval=2.0, maxval=6.0)
    cx = jax.random.uniform(kx, (n, 1, 1), minval=2.0, maxval=6.0)
    img = jnp.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
    return (img * 2.0 - 1.0)[..., None] * jnp.ones((1, 1, 1, 3))


def test_cd_step_runs_and_loss_decreases(sched, tiny):
    model, params = tiny
    cfg = TrainConfig(base_lr=2e-3, warmup_steps=0, ema_decay=0.95,
                      grad_clip=1.0)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, seed=0, tx=tx)
    ladder = consistency_ladder(T, 8)
    step = make_consistency_step(model, sched, ladder, tx, cfg)
    teacher = params
    losses = []
    batch = _blob_batch(jax.random.key(3))
    for _ in range(20):
        state, m = step(state, teacher, batch)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_cd_step_updates_ema_target(sched, tiny):
    """The EMA shadow (the CM target network) must move with the student."""
    model, params = tiny
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=0, ema_decay=0.5,
                      grad_clip=1.0)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, seed=0, tx=tx)
    ema_before = jax.tree.map(np.asarray, state.ema_params)
    step = make_consistency_step(
        model, sched, consistency_ladder(T, 4), tx, cfg)
    state, _ = step(state, params, _blob_batch(jax.random.key(4), n=4))
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
        ema_before, state.ema_params)
    assert max(jax.tree.leaves(moved)) > 0.0


def test_cd_conditional_guided(sched, tiny_cond):
    model, params = tiny_cond
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=0, ema_decay=0.9,
                      grad_clip=1.0)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, seed=0, tx=tx)
    step = make_consistency_step(
        model, sched, consistency_ladder(T, 4), tx, cfg, guidance=2.0)
    x = _blob_batch(jax.random.key(5), n=4)
    y = jnp.array([0, 1, 2, 0], jnp.int32)
    state, m = step(state, params, (x, y))
    assert np.isfinite(float(m["loss"]))


def test_distance_kinds(sched, tiny):
    from ddpm_diffusion_model_tpu.training.consistency import _distance
    a = jax.random.normal(jax.random.key(6), (2, RES, RES, 3))
    b = jax.random.normal(jax.random.key(7), (2, RES, RES, 3))
    l2 = _distance(a, b, "l2")
    ph = _distance(a, b, "pseudo_huber")
    assert l2.shape == (2,) and ph.shape == (2,)
    # pseudo-huber == 0 at zero distance, grows sub-quadratically
    z = _distance(a, a, "pseudo_huber")
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-6)
    with pytest.raises(ValueError):
        _distance(a, b, "l1")


# ---------- the driver ----------

def test_consistency_distill_driver(sched, tiny):
    model, params = tiny
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=0, ema_decay=0.9,
                      grad_clip=1.0)
    batches = [_blob_batch(jax.random.key(i), n=4) for i in range(2)]
    out, info = consistency_distill(
        model, sched, params, make_batches=lambda: iter(batches),
        num_ladder_steps=4, updates=3, cfg=cfg, log=None)
    assert info["steps"] == 1 and info["ladder_steps"] == 4
    assert len(info["phases"]) == 1
    assert np.isfinite(info["phases"][0]["last_loss"])
    # output is a fresh copy, not aliased to the teacher
    leaf_t = jax.tree.leaves(params)[0]
    leaf_o = jax.tree.leaves(out)[0]
    assert leaf_o.shape == leaf_t.shape


# ---------- sampling ----------

def test_sample_shapes_and_range(sched, tiny):
    model, params = tiny
    for steps in (1, 2, 4):
        x = consistency_sample_loop(
            model, params, sched, (2, RES, RES, 3), jax.random.key(8),
            steps=steps)
        assert x.shape == (2, RES, RES, 3)
        assert np.all(np.isfinite(np.asarray(x)))
        assert float(jnp.max(jnp.abs(x))) <= 1.0


def test_sample_deterministic_in_key(sched, tiny):
    model, params = tiny
    a = consistency_sample_loop(
        model, params, sched, (2, RES, RES, 3), jax.random.key(9), steps=3)
    b = consistency_sample_loop(
        model, params, sched, (2, RES, RES, 3), jax.random.key(9), steps=3)
    c = consistency_sample_loop(
        model, params, sched, (2, RES, RES, 3), jax.random.key(10), steps=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a - c))) > 1e-3


def test_sample_jits_whole(sched, tiny):
    model, params = tiny
    f = jax.jit(lambda p, k: consistency_sample_loop(
        model, p, sched, (2, RES, RES, 3), k, steps=2))
    x = f(params, jax.random.key(11))
    assert x.shape == (2, RES, RES, 3)


def test_sample_conditional(sched, tiny_cond):
    model, params = tiny_cond
    y = jnp.array([0, 2], jnp.int32)
    x = consistency_sample_loop(
        model, params, sched, (2, RES, RES, 3), jax.random.key(12),
        steps=2, y=y)
    assert x.shape == (2, RES, RES, 3)
    assert np.all(np.isfinite(np.asarray(x)))


def test_cli_consistency_roundtrip(tmp_path, capsys):
    """train -> distill --mode consistency -> sample-cm at 1 and 2 NFE."""
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
        run_name="cmcli", img_size=8, batch_size=4, epochs=1,
        sample_every=10, save_every=1,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny_exp.to_json())

    ckpt_dir = str(tmp_path / "ck")
    main(["train", "--config", cfg_path, "--data", "synthetic",
          "--synthetic-size", "16", "--ckpt-dir", ckpt_dir, "--no-samples"])
    capsys.readouterr()
    last = os.path.join(ckpt_dir, "cmcli_last")

    student = str(tmp_path / "cm_student")
    main(["distill", "--config", cfg_path, "--ckpt", last, "--ema",
          "--mode", "consistency", "--out", student,
          "--data", "synthetic", "--synthetic-size", "16",
          "--ladder-steps", "8", "--phase-updates", "2"])
    out = capsys.readouterr().out
    payload = _json.loads(
        [l for l in out.splitlines() if l.startswith("{")][-1])
    assert payload["mode"] == "consistency" and payload["steps"] == 1
    assert os.path.isdir(student)

    for nfe in (1, 2):
        png = str(tmp_path / f"cm{nfe}.png")
        main(["sample-cm", "--config", cfg_path, "--ckpt", student,
              "--n", "4", "--steps", str(nfe), "--out", png, "--ema"])
        out = capsys.readouterr().out
        assert "[SAMPLE-CM]" in out and os.path.exists(png)

    # a NON-consistency checkpoint must be rejected up front (its weights
    # do not parameterize f_theta — sampling would silently emit garbage)
    with pytest.raises(SystemExit, match="not a consistency student"):
        main(["sample-cm", "--config", cfg_path, "--ckpt", last,
              "--n", "4", "--steps", "1",
              "--out", str(tmp_path / "never.png"), "--ema"])


def test_perfect_consistency_zero_loss(sched, tiny):
    """If the student IS its own EMA target and the teacher step is the
    identity map in f-space (t == t'), the CD distance is exactly zero —
    the loss measures self-consistency, nothing else."""
    from ddpm_diffusion_model_tpu.training.consistency import _distance

    model, params = tiny
    z = jax.random.normal(jax.random.key(13), (2, RES, RES, 3))
    t = jnp.array([30, 70], jnp.int32)
    f1 = consistency_fn(model, params, sched, z, t)
    f2 = consistency_fn(model, params, sched, z, t)
    d = _distance(f1, f2, "pseudo_huber")
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
