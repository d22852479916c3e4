"""Sampler tests — ladders (all kinds), scan loops, strips, inference API.
Coverage mirrors ``testing/test_ddim.py`` (determinism/stochasticity, chain
stability, both schedules, edge timesteps) plus grid/strip artifact checks.
Uses a tiny U-Net so full loops stay fast on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.sampling import (
    build_ddim_schedule,
    ddim_sample_loop,
    ddpm_sample_loop,
    ddim_infer_sample,
    ddpm_infer_sample,
    render_denoise_strip,
    render_denoise_strip_ddim,
)

T = 100
RES = 8


@pytest.fixture(scope="module")
def sched():
    return make_schedule(DiffusionConfig(T=T, schedule="linear", img_size=RES))


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


# ---------- ladders ----------

def test_t_linear_ladder():
    ts = build_ddim_schedule("t_linear", 10, 1000)
    assert ts[0] == 999 and ts[-1] == 0
    assert np.all(np.diff(ts) < 0)


@pytest.mark.parametrize("kind", ["linear", "cosine", "karras"])
def test_warped_ladders(kind):
    ts = build_ddim_schedule(kind, 50, 1000)
    assert ts[0] == 999 and ts[-1] == 0
    assert np.all(np.diff(ts) < 0)
    assert len(ts) <= 52


def test_karras_front_loaded():
    # karras (p=2) spends more steps at high t than linear
    kar = build_ddim_schedule("karras", 20, 1000)
    lin = build_ddim_schedule("linear", 20, 1000)
    assert np.median(kar) > np.median(lin)


def test_alpha_bar_cosine_ladder(sched):
    ts = build_ddim_schedule(
        "alpha_bar_cosine", 20, T, alphas_cumprod=np.asarray(sched.alphas_cumprod)
    )
    assert ts[-1] == 0 and np.all(np.diff(ts) < 0)


def test_explicit_ladder():
    ts = build_ddim_schedule("t_linear", 10, 1000, explicit=[500, 100, 900, 100])
    np.testing.assert_array_equal(ts, [900, 500, 100, 0])


# ---------- loops ----------

def _eps_fn(model, params):
    return lambda x, t: model.apply(params, x, t)


def test_ddpm_loop_runs_and_is_finite(sched, tiny):
    model, params = tiny
    x0 = jax.random.normal(jax.random.key(1), (2, RES, RES, 3))
    x, frames = ddpm_sample_loop(sched, _eps_fn(model, params), x0, jax.random.key(2))
    assert x.shape == x0.shape
    assert np.all(np.isfinite(np.asarray(x)))
    assert frames is None


def test_ddpm_loop_deterministic_given_key(sched, tiny):
    model, params = tiny
    x0 = jax.random.normal(jax.random.key(3), (1, RES, RES, 3))
    f = jax.jit(lambda xi, k: ddpm_sample_loop(sched, _eps_fn(model, params), xi, k)[0])
    a = np.asarray(f(x0, jax.random.key(7)))
    b = np.asarray(f(x0, jax.random.key(7)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(f(x0, jax.random.key(8)))
    assert np.abs(a - c).max() > 1e-4


def test_ddpm_loop_capture_frames(sched, tiny):
    model, params = tiny
    x0 = jax.random.normal(jax.random.key(4), (1, RES, RES, 3))
    cap = [T - 1, T // 2, 0]
    x, frames = ddpm_sample_loop(
        sched, _eps_fn(model, params), x0, jax.random.key(5), capture_steps=cap
    )
    assert frames.shape == (3, RES, RES, 3)
    f = np.asarray(frames)
    assert np.all((f >= 0) & (f <= 1))
    # final frame (t=0 capture) equals the rescaled final x
    np.testing.assert_allclose(
        f[2], np.asarray((jnp.clip(x[0], -1, 1) + 1) / 2), atol=1e-6
    )


def test_capture_steps_without_ladder_overlap_raises(sched, tiny):
    model, params = tiny
    x0 = jax.random.normal(jax.random.key(4), (1, RES, RES, 3))
    with pytest.raises(ValueError, match="no overlap"):
        ddpm_sample_loop(sched, _eps_fn(model, params), x0,
                         jax.random.key(5), capture_steps=[T + 50])


def test_ddim_loop_eta0_deterministic_ignores_key(sched, tiny):
    model, params = tiny
    x0 = jax.random.normal(jax.random.key(6), (2, RES, RES, 3))
    ts = build_ddim_schedule("t_linear", 10, T)
    a = np.asarray(
        ddim_sample_loop(sched, _eps_fn(model, params), x0, jax.random.key(1),
                         timesteps=ts, eta=0.0)[0]
    )
    b = np.asarray(
        ddim_sample_loop(sched, _eps_fn(model, params), x0, jax.random.key(2),
                         timesteps=ts, eta=0.0)[0]
    )
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_ddim_loop_eta1_stochastic(sched, tiny):
    model, params = tiny
    x0 = jax.random.normal(jax.random.key(8), (2, RES, RES, 3))
    ts = build_ddim_schedule("t_linear", 10, T)
    a = np.asarray(
        ddim_sample_loop(sched, _eps_fn(model, params), x0, jax.random.key(1),
                         timesteps=ts, eta=1.0)[0]
    )
    b = np.asarray(
        ddim_sample_loop(sched, _eps_fn(model, params), x0, jax.random.key(2),
                         timesteps=ts, eta=1.0)[0]
    )
    assert np.abs(a - b).max() > 1e-4


def test_ddim_chain_stable_all_kinds(sched, tiny):
    model, params = tiny
    x0 = jax.random.normal(jax.random.key(9), (1, RES, RES, 3))
    for kind in ("t_linear", "cosine", "karras", "alpha_bar_cosine"):
        x, _ = ddim_sample_loop(
            sched, _eps_fn(model, params), x0, jax.random.key(10),
            schedule_kind=kind, steps=8,
        )
        assert np.all(np.isfinite(np.asarray(x))), kind
        assert np.abs(np.asarray(x)).max() < 50.0, kind


# ---------- inference API artifacts ----------

def test_ddpm_infer_sample_writes_grid(sched, tiny, tmp_path):
    model, params = tiny
    out = str(tmp_path / "g.png")
    grid = ddpm_infer_sample(
        model, params, sched, n=4, img_size=RES, out_path=out,
        save_individual=True, out_dir=str(tmp_path / "ind"),
    )
    assert os.path.exists(out)
    assert grid.ndim == 3 and grid.shape[-1] == 3
    assert len(os.listdir(tmp_path / "ind")) == 4


def test_ddim_infer_sample_schedules_and_seed_repro(sched, tiny, tmp_path):
    model, params = tiny
    out = str(tmp_path / "d.png")
    g1 = ddim_infer_sample(model, params, sched, n=4, img_size=RES,
                           out_path=out, steps=8, schedule_kind="t_linear")
    g2 = ddim_infer_sample(model, params, sched, n=4, img_size=RES,
                           out_path=out, steps=8, schedule_kind="t_linear")
    np.testing.assert_array_equal(g1, g2)  # same seed -> same grid
    g3 = ddim_infer_sample(model, params, sched, n=4, img_size=RES,
                           out_path=out, steps=8, schedule_kind="alpha_bar_cosine")
    assert os.path.exists(out) and g3.shape == g1.shape


def test_denoise_strips(sched, tiny, tmp_path):
    model, params = tiny
    p1 = str(tmp_path / "strip.png")
    g = render_denoise_strip(model, params, sched, img_size=RES, out_path=p1)
    assert os.path.exists(p1) and g.shape[-1] == 3

    p2 = str(tmp_path / "strip_ddim.png")
    g2 = render_denoise_strip_ddim(
        model, params, sched, img_size=RES, out_path=p2, steps=10,
        schedule_kind="cosine",
    )
    assert os.path.exists(p2) and g2.shape[-1] == 3


def test_ema_params_selects_weights(sched, tiny, tmp_path):
    model, params = tiny
    zero_params = jax.tree.map(jnp.zeros_like, params)
    out = str(tmp_path / "e.png")
    g_model = ddim_infer_sample(model, params, sched, n=1, img_size=RES,
                                out_path=out, steps=4)
    g_ema = ddim_infer_sample(model, params, sched, n=1, img_size=RES,
                              out_path=out, steps=4, ema_params=zero_params)
    assert np.abs(g_model - g_ema).max() > 1e-6
