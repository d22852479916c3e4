"""Image-editing samplers (sampling/editing.py): img2img (SDEdit) +
inpainting (RePaint-style replace + resampling).

Beyond-reference capabilities built from reference primitives (q_sample +
the DDIM scan).  Contracts under test:

- ladder truncation encodes strength correctly (bounds, min one step);
- with an ideal predictor both editors converge to the predictor's target
  (the generative math is right, independent of any trained model);
- img2img at low strength stays near the init image, at high strength it
  departs (faithfulness knob is monotone in practice);
- the inpaint KNOWN region survives bit-for-bit (exact final paste), an
  all-known mask is the identity, and a mask of zeros reduces exactly to
  the plain DDIM loop (eta=0);
- RePaint ``resamples > 1`` keeps all invariants;
- the jitted infer wrappers write grids, accept EMA params, and compose
  with CFG on a conditional model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.ops.schedules import extract
from ddpm_diffusion_model_tpu.sampling import (
    box_mask,
    ddim_sample_loop,
    img2img_infer_sample,
    img2img_sample_loop,
    inpaint_infer_sample,
    inpaint_sample_loop,
    truncate_ladder,
)
from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule

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


def _ladder(sched, steps=20):
    return build_ddim_schedule(
        "t_linear", steps, sched.T,
        alphas_cumprod=np.asarray(sched.alphas_cumprod))


def _ideal_eps_fn(sched, target):
    """The eps estimate for which predict_x0 == target at every (x, t)."""
    def eps_fn(x, t):
        a = extract(sched.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return (x - a * target) / b
    return eps_fn


@pytest.fixture(scope="module")
def images():
    k1, k2 = jax.random.split(jax.random.key(7))
    init = jnp.tanh(jax.random.normal(k1, (2, RES, RES, 3)))
    target = jnp.tanh(jax.random.normal(k2, (2, RES, RES, 3))) * 0.8
    return init, target


# ---------- ladder truncation ----------

def test_truncate_ladder_lengths(sched):
    ts = _ladder(sched, steps=20)
    assert len(truncate_ladder(ts, 1.0)) == len(ts)
    half = truncate_ladder(ts, 0.5)
    assert len(half) == round(0.5 * len(ts))
    # the tail of the ladder: ends at the same lowest t
    np.testing.assert_array_equal(half, np.asarray(ts)[len(ts) - len(half):])
    # at least TWO entries: the final t=0 terminator is never stepped by the
    # grid loop, so a one-entry tail would mean zero model calls
    assert len(truncate_ladder(ts, 0.001)) == 2


def test_img2img_minimal_strength_still_denoises(sched):
    """Regression: at the minimum truncation the model IS called — a
    sentinel predictor must affect the output."""
    init = jnp.zeros((1, RES, RES, 3))
    ts = truncate_ladder(_ladder(sched, 10), 0.01)
    run = lambda fn: np.asarray(img2img_sample_loop(
        sched, fn, init, jax.random.key(0), timesteps=ts, eta=0.0))
    out_sentinel = run(lambda x, t: jnp.full_like(x, 100.0))
    out_zero = run(lambda x, t: jnp.zeros_like(x))
    # same key -> identical q_sample noise; any difference proves the
    # predictor ran (the pre-fix one-entry tail made these bit-equal)
    assert np.abs(out_sentinel - out_zero).max() > 1e-3


@pytest.mark.parametrize("bad", [0.0, -0.3, 1.5])
def test_truncate_ladder_rejects_bad_strength(sched, bad):
    with pytest.raises(ValueError, match="strength"):
        truncate_ladder(_ladder(sched), bad)


# ---------- img2img ----------

def test_img2img_ideal_predictor_converges(sched, images):
    """Full strength + an ideal predictor: the edit lands on the
    predictor's target regardless of the init image."""
    init, target = images
    eps_fn = _ideal_eps_fn(sched, target)
    ts = truncate_ladder(_ladder(sched, 25), 1.0)
    out = img2img_sample_loop(
        sched, eps_fn, init, jax.random.key(3), timesteps=ts, eta=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=0.08)


def test_img2img_strength_controls_departure(sched, tiny, images):
    """Low strength stays near the init; high strength departs further
    (random-weights model: any departure measures noise injected + steps)."""
    model, params = tiny
    init, _ = images
    mses = {}
    for s in (0.1, 0.9):
        out = img2img_infer_sample(
            model, params, sched, init, strength=s, steps=20,
            seed=5, out_path=None)
        out_model_space = out * 2.0 - 1.0
        mses[s] = float(np.mean((out_model_space - np.asarray(init)) ** 2))
    assert mses[0.1] < mses[0.9]
    assert mses[0.1] < 0.1  # light touch really is light


def test_img2img_seed_determinism(sched, tiny, images):
    model, params = tiny
    init, _ = images
    a = img2img_infer_sample(model, params, sched, init, strength=0.5,
                             steps=10, seed=11, out_path=None)
    b = img2img_infer_sample(model, params, sched, init, strength=0.5,
                             steps=10, seed=11, out_path=None)
    c = img2img_infer_sample(model, params, sched, init, strength=0.5,
                             steps=10, seed=12, out_path=None)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4


def test_img2img_replicates_single_image(sched, tiny, images, tmp_path):
    model, params = tiny
    init, _ = images
    out_png = str(tmp_path / "i2i.png")
    out = img2img_infer_sample(
        model, params, sched, np.asarray(init[0]), n=4, strength=0.7,
        steps=8, seed=2, out_path=out_png)
    assert out.shape == (4, RES, RES, 3)
    assert (tmp_path / "i2i.png").exists()
    assert 0.0 <= out.min() and out.max() <= 1.0
    # independent per-row noise: variations differ
    assert np.abs(out[0] - out[1]).max() > 1e-4


# ---------- inpainting ----------

def test_inpaint_known_region_survives_exactly(sched, tiny, images):
    model, params = tiny
    from ddpm_diffusion_model_tpu.sampling.inference import cfg_eps_fn

    init, _ = images
    mask = jnp.asarray(box_mask(RES, (2, 2, 6, 6)))  # generate the center
    eps_fn = cfg_eps_fn(model, params, sched=sched)
    x_init = jax.random.normal(jax.random.key(1), init.shape)
    out = inpaint_sample_loop(
        sched, eps_fn, init, mask, x_init, jax.random.key(4),
        timesteps=_ladder(sched, 10), eta=0.0)
    out, init_np, m = np.asarray(out), np.asarray(init), np.asarray(mask)
    np.testing.assert_array_equal(out[:, m[..., 0] == 1, :],
                                  init_np[:, m[..., 0] == 1, :])
    # and the generated region actually changed
    assert np.abs(out[:, m[..., 0] == 0, :]
                  - init_np[:, m[..., 0] == 0, :]).max() > 1e-3


def test_inpaint_all_known_is_identity(sched, tiny, images):
    model, params = tiny
    from ddpm_diffusion_model_tpu.sampling.inference import cfg_eps_fn

    init, _ = images
    out = inpaint_sample_loop(
        sched, cfg_eps_fn(model, params, sched=sched), init,
        jnp.ones((RES, RES, 1)),
        jax.random.normal(jax.random.key(1), init.shape), jax.random.key(4),
        timesteps=_ladder(sched, 6), eta=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(init))


def test_inpaint_no_known_equals_plain_ddim(sched, tiny, images):
    """mask == 0 everywhere + eta=0 reduces exactly to the plain DDIM loop
    from the same init noise."""
    model, params = tiny
    from ddpm_diffusion_model_tpu.sampling.inference import cfg_eps_fn

    init, _ = images
    eps_fn = cfg_eps_fn(model, params, sched=sched)
    ts = _ladder(sched, 8)
    x_init = jax.random.normal(jax.random.key(9), init.shape)
    out_inpaint = inpaint_sample_loop(
        sched, eps_fn, init, jnp.zeros((RES, RES, 1)), x_init,
        jax.random.key(4), timesteps=ts, eta=0.0)
    out_plain, _ = ddim_sample_loop(
        sched, eps_fn, x_init, jax.random.key(4), timesteps=ts, eta=0.0)
    np.testing.assert_allclose(np.asarray(out_inpaint),
                               np.asarray(out_plain), atol=1e-6)


def test_inpaint_ideal_predictor_fills_with_target(sched, images):
    """Ideal predictor toward `target`: the generated region lands on the
    target while the known region stays the init image."""
    init, target = images
    eps_fn = _ideal_eps_fn(sched, target)
    mask = jnp.asarray(box_mask(RES, (0, 0, 8, 4)))  # generate the top half
    x_init = jax.random.normal(jax.random.key(2), init.shape)
    out = inpaint_sample_loop(
        sched, eps_fn, init, mask, x_init, jax.random.key(5),
        timesteps=_ladder(sched, 25), eta=0.0)
    out, m = np.asarray(out), np.asarray(mask)
    np.testing.assert_array_equal(out[:, m[..., 0] == 1, :],
                                  np.asarray(init)[:, m[..., 0] == 1, :])
    np.testing.assert_allclose(out[:, m[..., 0] == 0, :],
                               np.asarray(target)[:, m[..., 0] == 0, :],
                               atol=0.15)


@pytest.mark.parametrize("resamples", [1, 3])
def test_inpaint_resamples_invariants(sched, tiny, images, resamples):
    model, params = tiny
    from ddpm_diffusion_model_tpu.sampling.inference import cfg_eps_fn

    init, _ = images
    mask = jnp.asarray(box_mask(RES, (0, 4, 8, 8)))
    out = inpaint_sample_loop(
        sched, cfg_eps_fn(model, params, sched=sched), init, mask,
        jax.random.normal(jax.random.key(1), init.shape), jax.random.key(6),
        timesteps=_ladder(sched, 6), eta=0.0, resamples=resamples)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    m = np.asarray(mask)
    np.testing.assert_array_equal(out[:, m[..., 0] == 1, :],
                                  np.asarray(init)[:, m[..., 0] == 1, :])


def test_inpaint_rejects_bad_resamples(sched, tiny, images):
    model, params = tiny
    from ddpm_diffusion_model_tpu.sampling.inference import cfg_eps_fn

    init, _ = images
    with pytest.raises(ValueError, match="resamples"):
        inpaint_sample_loop(
            sched, cfg_eps_fn(model, params, sched=sched), init,
            jnp.ones((RES, RES, 1)), init, jax.random.key(0),
            timesteps=_ladder(sched, 6), resamples=0)


def test_inpaint_infer_wrapper_grid_and_ema(sched, tiny, tmp_path, images):
    model, params = tiny
    init, _ = images
    # a visibly different "EMA" tree proves the param selection is live
    ema = jax.tree.map(lambda p: p * 0.5, params)
    mask = box_mask(RES, (2, 2, 6, 6))
    out_png = str(tmp_path / "inp.png")
    a = inpaint_infer_sample(model, params, sched, np.asarray(init[0]), mask,
                             n=4, steps=8, seed=3, out_path=out_png)
    b = inpaint_infer_sample(model, params, sched, np.asarray(init[0]), mask,
                             n=4, steps=8, seed=3, out_path=None,
                             ema_params=ema)
    assert (tmp_path / "inp.png").exists()
    assert a.shape == (4, RES, RES, 3)
    assert np.abs(a - b).max() > 1e-4


def test_box_mask_values_and_bounds():
    m = box_mask(8, (1, 2, 4, 6))
    assert m.shape == (8, 8, 1)
    assert m[2:6, 1:4].sum() == 0.0
    assert m.sum() == 64 - 12
    with pytest.raises(ValueError, match="box"):
        box_mask(8, (0, 0, 9, 4))
    with pytest.raises(ValueError, match="box"):
        box_mask(8, (4, 0, 2, 4))


# ---------- CFG composition ----------

def test_editing_composes_with_cfg(sched, images):
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(4,), time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=RES, num_classes=3,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)),
                        jnp.zeros((1,)), y=jnp.zeros((1,), jnp.int32))
    init, _ = images
    out = img2img_infer_sample(
        model, params, sched, init, strength=0.5, steps=8, seed=1,
        out_path=None, class_id=1, guidance=2.0)
    assert np.isfinite(out).all()
    out2 = inpaint_infer_sample(
        model, params, sched, init, box_mask(RES, (0, 0, 4, 4)),
        steps=8, seed=1, out_path=None, class_id=1, guidance=2.0)
    assert np.isfinite(out2).all()
