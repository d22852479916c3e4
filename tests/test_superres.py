"""Super-resolution cascade (SR3 / Cascaded Diffusion Models).

Capability BEYOND the reference: the reference's 64px and 256px models are
unrelated unconditional runs (``README.md`` galleries; the CelebHQ notebook
is just a bigger config).  Contracts under test:

- conditioning ops (``ops/superres.py``): degrade/upsample/build/aug shapes,
  guards, and the aug<=0 RNG-neutrality contract;
- ``UNetConfig.cond_channels``: the concat-before-stem conditioning, its
  guards, and that the cond tensor actually steers the output;
- the self-supervised SR train loss (``TrainConfig.superres_factor``):
  config cross-validation, learning on a fixed batch, eval/probe parity;
- samplers (``sampling/superres.py``): upsampler shapes/determinism/
  replication, CFG composition through ``cfg_eps_fn(x_cond=)``, and the
  two-stage ``cascade_infer_sample``;
- CLI: ``upsample`` and ``cascade`` end-to-end from a trained tiny SR
  checkpoint, plus the ``sr64to256`` preset's shape.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.ops.superres import (
    aug_cond,
    build_cond,
    degrade,
    upsample_cond,
)
from ddpm_diffusion_model_tpu.sampling import (
    cascade_infer_sample,
    upsample_infer_sample,
)
from ddpm_diffusion_model_tpu.sampling.inference import cfg_eps_fn
from ddpm_diffusion_model_tpu.training import (
    TrainConfig,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from ddpm_diffusion_model_tpu.training.step import make_probe_fn

K = jax.random.key
RES = 16

SR_KW = dict(in_channels=3, base_channels=32, channel_mults=(1, 2),
             num_res_blocks=1, attn_resolutions=(8,), time_embed_dim=32,
             dropout=0.0, num_heads=2, head_dim=8, img_resolution=RES)


def _sr_model(**extra):
    cfg = UNetConfig(**SR_KW, cond_channels=3, **extra)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(K(0), jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)),
                        x_cond=jnp.zeros((1, RES, RES, 3)))
    return model, params


def _smooth_batch(n=8, res=RES, seed=3):
    """Low-frequency [-1,1] images: the /2 view keeps most content, so SR
    conditioning is informative."""
    rng = np.random.default_rng(seed)
    small = rng.normal(size=(n, res // 4, res // 4, 3)).astype(np.float32)
    x = jax.image.resize(jnp.asarray(small), (n, res, res, 3), "linear")
    return jnp.clip(x, -1, 1)


# ---------- conditioning ops ----------

def test_degrade_shape_and_guards():
    x = jnp.ones((2, 16, 16, 3))
    assert degrade(x, 2).shape == (2, 8, 8, 3)
    assert degrade(x, 4).shape == (2, 4, 4, 3)
    with pytest.raises(ValueError, match="factor"):
        degrade(x, 1)
    with pytest.raises(ValueError, match="divisible"):
        degrade(jnp.ones((1, 15, 15, 3)), 2)


def test_degrade_preserves_constants_and_mean():
    c = jnp.full((1, 16, 16, 3), 0.37)
    np.testing.assert_allclose(np.asarray(degrade(c, 4)), 0.37, rtol=1e-6)
    # antialiased downsample ~ local averaging: global mean preserved
    x = _smooth_batch(2)
    np.testing.assert_allclose(
        float(degrade(x, 2).mean()), float(x.mean()), atol=0.02)


def test_upsample_cond_shape_and_guard():
    low = jnp.ones((2, 4, 4, 3))
    assert upsample_cond(low, 16).shape == (2, 16, 16, 3)
    with pytest.raises(ValueError, match="larger than target"):
        upsample_cond(jnp.ones((1, 32, 32, 3)), 16)


def test_build_cond_is_compose_and_keeps_shape():
    x = _smooth_batch(2)
    c = build_cond(x, 2)
    assert c.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(c), np.asarray(upsample_cond(degrade(x, 2), RES)),
        rtol=1e-6)
    # the low-res view of a smooth image stays close to the image
    assert float(jnp.abs(c - x).mean()) < 0.2


def test_aug_cond_zero_identity_positive_perturbs():
    cond = _smooth_batch(4)
    out0 = aug_cond(K(1), cond, 0.0)
    assert out0 is cond  # no RNG burned, bit-identical object
    out = aug_cond(K(1), cond, 0.5)
    d = np.asarray(out - cond)
    assert d.std() > 0
    # per-sample sigma ~ U[0, 0.5]: no sample's noise exceeds the max scale
    per = d.reshape(4, -1).std(axis=1)
    assert (per <= 0.5 * 1.2).all()


# ---------- model conditioning contract ----------

def test_cond_channels_guards():
    model, params = _sr_model()
    x, t = jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,))
    with pytest.raises(ValueError, match="requires"):
        model.apply(params, x, t)
    with pytest.raises(ValueError, match="channels"):
        model.apply(params, x, t, x_cond=jnp.zeros((1, RES, RES, 1)))
    # and the reverse: x_cond on a cond-free model
    plain = UNetDenoiser(UNetConfig(**SR_KW), dtype=jnp.float32)
    p = plain.init(K(0), x, t)
    with pytest.raises(ValueError, match="without cond_channels"):
        plain.apply(p, x, t, x_cond=x)


def test_cond_widens_stem_and_steers_output():
    model, params = _sr_model()
    stem = params["params"]["in_conv"]["kernel"]
    assert stem.shape[2] == 6  # 3 image + 3 conditioning channels
    x, t = _smooth_batch(2), jnp.array([5.0, 9.0])
    e1 = model.apply(params, x, t, x_cond=jnp.zeros_like(x))
    e2 = model.apply(params, x, t, x_cond=x)
    assert e1.shape == x.shape
    assert float(jnp.abs(e1 - e2).max()) > 1e-4


# ---------- train loss / step ----------

def test_superres_config_cross_validation():
    sched = make_schedule(DiffusionConfig(T=20, img_size=RES))
    model, _ = _sr_model()
    plain = UNetDenoiser(UNetConfig(**SR_KW), dtype=jnp.float32)
    gray = UNetDenoiser(UNetConfig(**{**SR_KW, "cond_channels": 1}),
                        dtype=jnp.float32)
    tx = make_optimizer(TrainConfig())
    with pytest.raises(ValueError, match="cond_channels"):
        make_train_step(plain, sched, tx, TrainConfig(superres_factor=2))
    with pytest.raises(ValueError, match="superres_factor"):
        make_train_step(model, sched, tx, TrainConfig())
    with pytest.raises(ValueError, match="must equal in_channels"):
        make_train_step(gray, sched, tx, TrainConfig(superres_factor=2))


def test_sr_train_step_learns_and_eval_probe_agree():
    model, params = _sr_model()
    sched = make_schedule(DiffusionConfig(T=50, img_size=RES))
    cfg = TrainConfig(base_lr=3e-3, warmup_steps=None, grad_accum_steps=1,
                      ema_decay=0.99, superres_factor=2, cond_aug=0.1)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, tx=tx)
    step = make_train_step(model, sched, tx, cfg)

    batch = _smooth_batch(8)
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    ev = make_eval_step(model, sched, superres_factor=2)
    val = float(ev(state.params, batch, K(7)))
    assert np.isfinite(val)
    probe = make_probe_fn(model, sched, superres_factor=2)
    pv = np.asarray(probe(state.params, batch, (5, 25), K(8)))
    assert pv.shape == (2,) and np.isfinite(pv).all()


def test_build_cond_commutes_with_batch_split():
    """Microbatched SR loss builds each microbatch's own cond; that is only
    sound because resize is per-sample: split-then-degrade == degrade-then-
    split, exactly."""
    x = _smooth_batch(8)
    whole = np.asarray(build_cond(x, 2))
    halves = np.concatenate(
        [np.asarray(build_cond(x[:4], 2)), np.asarray(build_cond(x[4:], 2))])
    np.testing.assert_allclose(whole, halves, rtol=1e-6, atol=1e-7)


def test_sr_grad_accum_smoke():
    """Accum contract matches the non-SR one (test_grad_accum_equivalence):
    different RNG per microbatch -> not bit-identical, but finite, same
    scale, and ONE optimizer step."""
    model, params = _sr_model()
    sched = make_schedule(DiffusionConfig(T=50, img_size=RES))
    batch = _smooth_batch(8)
    metrics, states = [], []
    for accum in (1, 2):
        cfg = TrainConfig(base_lr=1e-3, warmup_steps=None,
                          grad_accum_steps=accum, superres_factor=2)
        tx = make_optimizer(cfg)
        state, _ = init_train_state(params, cfg, tx=tx)
        step = make_train_step(model, sched, tx, cfg)
        state, m = step(state, batch)
        metrics.append(float(m["loss"]))
        states.append(state)
    assert np.isfinite(metrics).all()
    assert abs(metrics[0] - metrics[1]) < 2.0
    assert int(states[1].step) == 1  # 2 microbatches = ONE optimizer step


# ---------- samplers ----------

def test_upsample_infer_sample_shapes_seed_replicate(tmp_path):
    model, params = _sr_model()
    sched = make_schedule(DiffusionConfig(T=50, img_size=RES))
    low = np.asarray(degrade(_smooth_batch(1), 2))[0]  # (8, 8, 3)

    out = str(tmp_path / "up.png")
    x1 = upsample_infer_sample(model, params, sched, low, n=4, steps=6,
                               seed=11, out_path=out)
    assert x1.shape == (4, RES, RES, 3)
    assert x1.min() >= 0.0 and x1.max() <= 1.0
    assert os.path.exists(out)
    # replicated single image, independent noise per row -> rows differ
    assert float(np.abs(x1[0] - x1[1]).max()) > 1e-5
    # deterministic under the same seed
    x2 = upsample_infer_sample(model, params, sched, low, n=4, steps=6,
                               seed=11, out_path=None)
    np.testing.assert_allclose(x1, x2, atol=1e-6)
    # a different conditioning changes the result
    x3 = upsample_infer_sample(model, params, sched, np.zeros_like(low),
                               n=4, steps=6, seed=11, out_path=None)
    assert float(np.abs(x1 - x3).max()) > 1e-4


def test_upsample_guards():
    model, params = _sr_model()
    sched = make_schedule(DiffusionConfig(T=50, img_size=RES))
    low = np.zeros((3, 8, 8, 3), np.float32)
    with pytest.raises(ValueError, match="batch 3 but n=4"):
        upsample_infer_sample(model, params, sched, low, n=4, steps=4,
                              out_path=None)
    plain = UNetDenoiser(UNetConfig(**SR_KW), dtype=jnp.float32)
    p = plain.init(K(0), jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)))
    with pytest.raises(ValueError, match="image-conditional"):
        upsample_infer_sample(plain, p, sched, low[:1], n=1, steps=4,
                              out_path=None)


def test_cfg_eps_fn_composes_with_x_cond():
    """CFG on an image-conditional model: both branches see the SAME cond;
    the combination matches two manual forwards exactly."""
    model, params = _sr_model(num_classes=3)
    x, t = _smooth_batch(2), jnp.array([7.0, 3.0])
    cond = build_cond(x, 2)
    y = jnp.array([0, 2], jnp.int32)
    w = 2.5
    fn = cfg_eps_fn(model, params, y=y, guidance=w, x_cond=cond)
    got = fn(x, t)
    e_c = model.apply(params, x, t, y=y, x_cond=cond)
    e_u = model.apply(params, x, t, y=jnp.full_like(y, 3), x_cond=cond)
    want = e_u + w * (e_c - e_u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_cascade_infer_sample(tmp_path):
    base_cfg = UNetConfig(**{**SR_KW, "img_resolution": 8})
    base = UNetDenoiser(base_cfg, dtype=jnp.float32)
    base_p = base.init(K(1), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)))
    base_sched = make_schedule(DiffusionConfig(T=50, img_size=8))
    sr_model, sr_params = _sr_model()
    sr_sched = make_schedule(DiffusionConfig(T=50, img_size=RES))

    out = str(tmp_path / "cascade.png")
    out_low = str(tmp_path / "cascade_low.png")
    low01, hi01 = cascade_infer_sample(
        base, base_p, base_sched, sr_model, sr_params, sr_sched,
        n=4, base_steps=5, sr_steps=5, seed=2,
        out_path=out, out_low_path=out_low)
    assert low01.shape == (4, 8, 8, 3)
    assert hi01.shape == (4, RES, RES, 3)
    for a in (low01, hi01):
        assert a.min() >= 0.0 and a.max() <= 1.0
    assert os.path.exists(out) and os.path.exists(out_low)


# ---------- preset + CLI ----------

def test_sr_preset_shape():
    from ddpm_diffusion_model_tpu.utils.config import get_preset

    exp = get_preset("sr64to256")
    assert exp.model.cond_channels == 3
    assert exp.model.img_resolution == 256
    assert exp.train.superres_factor == 4
    assert exp.train.cond_aug > 0
    assert exp.diffusion.dynamic_threshold == 0.995
    # round-trips through JSON (the config sidecar / CLI path)
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    assert ExperimentConfig.from_json(exp.to_json()) == exp


def test_cli_sr_train_upsample_cascade_roundtrip(tmp_path, capsys):
    """Train a tiny SR upsampler and a tiny base model via the CLI, then
    drive ``upsample`` (PNG in) and ``cascade`` (base ckpt + SR ckpt)."""
    from ddpm_diffusion_model_tpu.cli import main
    from ddpm_diffusion_model_tpu.utils.config import (
        DiffusionConfig as DC,
        ExperimentConfig,
    )
    from ddpm_diffusion_model_tpu.models.unet import UNetConfig as MC

    sr = ExperimentConfig(
        model=MC(in_channels=3, base_channels=8, channel_mults=(1, 2),
                 num_res_blocks=1, attn_resolutions=(), time_embed_dim=16,
                 num_heads=1, head_dim=8, img_resolution=16,
                 cond_channels=3),
        diffusion=DC(T=20, img_size=16),
        train=TrainConfig(base_lr=1e-3, warmup_steps=2, grad_accum_steps=1,
                          superres_factor=2, cond_aug=0.05),
        run_name="srtest", img_size=16, batch_size=4, epochs=1,
        sample_every=1, sample_n=4, save_every=1,
    )
    base = dataclasses.replace(
        sr,
        model=dataclasses.replace(sr.model, img_resolution=8,
                                  cond_channels=0),
        diffusion=DC(T=20, img_size=8),
        train=TrainConfig(base_lr=1e-3, warmup_steps=2, grad_accum_steps=1),
        run_name="basetest", img_size=8, sample_every=10,
    )
    sr_cfg = str(tmp_path / "sr.json")
    base_cfg = str(tmp_path / "base.json")
    for path, exp in ((sr_cfg, sr), (base_cfg, base)):
        with open(path, "w") as f:
            f.write(exp.to_json())

    ck = str(tmp_path / "ck")
    # SR train WITH the per-epoch sample hook: the grid must go through the
    # fixed low-res anchor path (upsample_infer_sample), not the plain grid
    main(["train", "--config", sr_cfg, "--data", "synthetic",
          "--synthetic-size", "8", "--ckpt-dir", ck])
    out = capsys.readouterr().out
    assert "DDPM run: srtest" in out
    sr_ckpt = os.path.join(ck, "srtest_last")
    assert os.path.isdir(sr_ckpt)
    grid0 = os.path.join(ck, "srtest_samples_e000.png")
    assert os.path.exists(grid0)

    main(["train", "--config", base_cfg, "--data", "synthetic",
          "--synthetic-size", "8", "--ckpt-dir", ck, "--no-samples"])
    capsys.readouterr()
    base_ckpt = os.path.join(ck, "basetest_last")

    # upsample an arbitrary PNG through the SR checkpoint
    up = str(tmp_path / "up.png")
    main(["upsample", "--config", sr_cfg, "--ckpt", sr_ckpt, "--init", grid0,
          "--low-size", "8", "--n", "4", "--steps", "4", "--out", up])
    out = capsys.readouterr().out
    assert "[UPSAMPLE]" in out and "8px -> 16px" in out
    assert os.path.exists(up)

    # full cascade: base 8px samples -> SR 16px grid
    hi = str(tmp_path / "hi.png")
    lo = str(tmp_path / "lo.png")
    main(["cascade", "--config", sr_cfg, "--ckpt", sr_ckpt,
          "--base-ckpt", base_ckpt, "--base-config", base_cfg,
          "--n", "4", "--base-steps", "4", "--steps", "4",
          "--out", hi, "--out-low", lo])
    out = capsys.readouterr().out
    assert "[CASCADE]" in out
    assert os.path.exists(hi) and os.path.exists(lo)

    # upsample on a cond-free checkpoint refuses cleanly
    with pytest.raises(SystemExit, match="image-conditional"):
        main(["upsample", "--config", base_cfg, "--ckpt", base_ckpt,
              "--init", grid0, "--out", up])
