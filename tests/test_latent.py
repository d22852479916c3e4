"""Latent-diffusion family: KL-VAE (models/autoencoder.py, training/vae.py)
+ diffusion-on-latents glue (sampling/latent.py) + CLI.

The reference is pixel-space only; the latent family reuses the ENTIRE
standard stack (train step, samplers, checkpoints) on encoded corpora —
these tests pin the autoencoder math, the scale-factor contract, the
unclamped-latent sampler path, and the train-vae -> train --latent-vae ->
sample --vae CLI pipeline end to end.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.models.autoencoder import (
    AutoEncoderConfig,
    AutoEncoderKL,
    gaussian_posterior_sample,
    latent_scale_factor,
    posterior_kl,
    vae_16x_config,
)
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.sampling import (
    check_latent_config,
    encode_corpus,
    latent_sample,
    make_latent_sample_fn,
)
from ddpm_diffusion_model_tpu.training import TrainConfig
from ddpm_diffusion_model_tpu.training.vae import (
    load_vae,
    make_vae_train_step,
    train_vae,
    vae_decode_fn,
    vae_encode_fn,
)

RES = 16


@pytest.fixture(scope="module")
def tiny_vae():
    """A tiny trained VAE + its data, shared across the module."""
    acfg = vae_16x_config()
    vae = AutoEncoderKL(acfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    # COMPRESSIBLE data (4x4 blocks upsampled to 16px): iid noise can't fit
    # through an f=2 bottleneck, so reconstruction tests would be vacuous
    small = rng.uniform(-1, 1, (32, RES // 4, RES // 4, 3)).astype(np.float32)
    data = np.repeat(np.repeat(small, 4, axis=1), 4, axis=2)

    class Loader:
        def __iter__(self):
            for i in range(0, 32, 8):
                yield data[i:i + 8]

    cfg = TrainConfig(base_lr=2e-3, warmup_steps=2, grad_clip=1.0,
                      flat_optimizer=False)
    state, last = train_vae(vae, Loader(), cfg, epochs=5, kl_weight=1e-5,
                            log_every=0)
    return vae, state, data, last


# ---------- autoencoder math ----------

def test_config_factor_and_latent_resolution():
    acfg = AutoEncoderConfig(channel_mults=(1, 2, 4), img_resolution=64)
    assert acfg.factor == 4 and acfg.latent_resolution == 16
    bad = AutoEncoderConfig(channel_mults=(1, 2, 4), img_resolution=66)
    with pytest.raises(ValueError, match="divisible"):
        _ = bad.latent_resolution


def test_vae_shapes_and_kl(tiny_vae):
    vae, state, data, _ = tiny_vae
    mean, logvar = vae.apply(state.params, jnp.asarray(data[:4]),
                             method=AutoEncoderKL.encode)
    acfg = vae.config
    assert mean.shape == (4, acfg.latent_resolution, acfg.latent_resolution,
                          acfg.latent_channels)
    assert mean.shape == logvar.shape
    x_hat = vae.apply(state.params, mean, method=AutoEncoderKL.decode)
    assert x_hat.shape == (4, RES, RES, 3)
    kl = np.asarray(posterior_kl(mean, logvar))
    assert kl.shape == (4,) and (kl >= 0).all() and np.isfinite(kl).all()


def test_posterior_kl_closed_form_zero():
    z = jnp.zeros((2, 3, 3, 4))
    np.testing.assert_allclose(np.asarray(posterior_kl(z, z)), 0.0, atol=0)


def test_posterior_sample_reparameterization():
    mean = jnp.full((1, 2, 2, 1), 3.0)
    logvar = jnp.full((1, 2, 2, 1), -40.0)  # ~zero variance
    z = gaussian_posterior_sample(jax.random.key(0), mean, logvar)
    np.testing.assert_allclose(np.asarray(z), 3.0, atol=1e-6)
    # deterministic given the key
    a = gaussian_posterior_sample(jax.random.key(1), mean, jnp.zeros_like(mean))
    b = gaussian_posterior_sample(jax.random.key(1), mean, jnp.zeros_like(mean))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vae_training_learns(tiny_vae):
    vae, state, data, last = tiny_vae
    # fresh-init loss for comparison
    params0 = vae.init(jax.random.key(7), jnp.asarray(data[:1]))
    x = jnp.asarray(data[:8])
    mean, logvar = vae.apply(params0, x, method=AutoEncoderKL.encode)
    x0_hat = vae.apply(params0, mean, method=AutoEncoderKL.decode)
    loss0 = float(jnp.mean(jnp.square(x0_hat - x)))
    assert last["recon"] < 0.75 * loss0, (last, loss0)


def test_train_step_metrics_finite(tiny_vae):
    vae, _state, data, _ = tiny_vae
    from ddpm_diffusion_model_tpu.training import (
        init_train_state,
        make_optimizer,
    )

    cfg = TrainConfig(base_lr=1e-3, warmup_steps=2, flat_optimizer=False)
    params = vae.init(jax.random.key(0), jnp.asarray(data[:1]))
    state, tx = init_train_state(params, cfg)
    step = make_vae_train_step(vae, tx, cfg, kl_weight=1e-3)
    state, m = step(state, jnp.asarray(data[:8]))
    for k in ("loss", "recon", "kl", "grad_norm"):
        assert np.isfinite(float(m[k])), (k, m)
    assert int(state.step) == 1


# ---------- corpus encoding + the scale contract ----------

def test_encode_corpus_scale_and_sources(tiny_vae):
    vae, state, data, _ = tiny_vae
    lat, scale = encode_corpus(vae, state.params, data, batch_size=8)
    acfg = vae.config
    assert lat.shape == (32, acfg.latent_resolution, acfg.latent_resolution,
                         acfg.latent_channels)
    # the scale normalizes the first batch to ~unit std; the corpus follows
    assert 0.5 < np.std(lat) < 2.0
    # loader source == array source (labels dropped)
    labeled = [(data[i:i + 8], np.zeros((8,), np.int64))
               for i in range(0, 32, 8)]
    lat2, scale2 = encode_corpus(vae, state.params, labeled, batch_size=8)
    assert scale2 == scale
    np.testing.assert_array_equal(lat, lat2)
    # explicit scale is honored verbatim
    lat3, scale3 = encode_corpus(vae, state.params, data, scale=2.0)
    assert scale3 == 2.0
    np.testing.assert_allclose(lat3, lat / scale * 2.0, rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip_scale_inverts(tiny_vae):
    vae, state, data, _ = tiny_vae
    lat, scale = encode_corpus(vae, state.params, data[:8])
    enc = vae_encode_fn(vae, state.params, scale=scale)
    dec = vae_decode_fn(vae, state.params, scale=scale)
    z = enc(jnp.asarray(data[:8]))
    # encode_corpus runs under jit; allow jit-vs-eager fp reassociation
    np.testing.assert_allclose(np.asarray(z), lat, rtol=1e-3, atol=1e-5)
    x_hat = np.asarray(dec(z))
    assert x_hat.shape == (8, RES, RES, 3)
    assert x_hat.min() >= -1.0 and x_hat.max() <= 1.0
    # decode(encode(x)) correlates with x after training (not a tautology:
    # an untrained VAE decodes noise)
    x = data[:8]
    corr = np.corrcoef(x_hat.ravel(), x.ravel())[0, 1]
    assert corr > 0.5, corr


# ---------- latent config contract ----------

def _latent_model_cfg(acfg, **kw):
    return UNetConfig(
        in_channels=acfg.latent_channels, base_channels=8,
        channel_mults=(1, 2), num_res_blocks=1, attn_resolutions=(),
        time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=acfg.latent_resolution, **kw)


def test_check_latent_config_guards():
    acfg = vae_16x_config()
    good_d = DiffusionConfig(T=20, img_size=8, clamp_x0=False)
    check_latent_config(_latent_model_cfg(acfg), good_d, acfg)  # no raise
    with pytest.raises(ValueError, match="in_channels"):
        check_latent_config(
            dataclasses.replace(_latent_model_cfg(acfg), in_channels=3),
            good_d, acfg)
    with pytest.raises(ValueError, match="img_resolution"):
        check_latent_config(
            dataclasses.replace(_latent_model_cfg(acfg), img_resolution=16),
            good_d, acfg)
    with pytest.raises(ValueError, match="clamp_x0"):
        check_latent_config(
            _latent_model_cfg(acfg),
            DiffusionConfig(T=20, img_size=8, clamp_x0=True), acfg)
    with pytest.raises(ValueError, match="clamp_x0"):
        check_latent_config(
            _latent_model_cfg(acfg),
            DiffusionConfig(T=20, img_size=8, clamp_x0=False,
                            dynamic_threshold=0.95), acfg)


# ---------- latent sampling ----------

@pytest.fixture(scope="module")
def latent_denoiser(tiny_vae):
    vae, _state, _data, _ = tiny_vae
    acfg = vae.config
    mcfg = _latent_model_cfg(acfg)
    model = UNetDenoiser(mcfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=20, img_size=8, clamp_x0=False))
    params = model.init(
        jax.random.key(0),
        jnp.ones((1, acfg.latent_resolution, acfg.latent_resolution,
                  acfg.latent_channels)),
        jnp.zeros((1,)))
    return model, params, sched


@pytest.mark.parametrize("kind", ["ddpm", "ddim", "dpmpp"])
def test_latent_sample_kinds(tiny_vae, latent_denoiser, kind, tmp_path):
    vae, state, _data, _ = tiny_vae
    model, params, sched = latent_denoiser
    out = str(tmp_path / f"{kind}.png")
    imgs = latent_sample(model, params, sched, vae, state.params, n=2,
                         scale=1.5, kind=kind, steps=4, seed=3,
                         save_path=out)
    assert imgs.shape == (2, RES, RES, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert os.path.exists(out)
    # deterministic given the seed
    again = latent_sample(model, params, sched, vae, state.params, n=2,
                          scale=1.5, kind=kind, steps=4, seed=3)
    np.testing.assert_array_equal(imgs, again)


def test_latent_sample_fn_matches_direct(tiny_vae, latent_denoiser, tmp_path):
    vae, state, _data, _ = tiny_vae
    model, params, sched = latent_denoiser
    fn = make_latent_sample_fn(vae, state.params, scale=1.5, kind="ddim",
                               steps=4)
    out = str(tmp_path / "hook.png")
    got = fn(model, params, sched, n=2, img_size=999, save_path=out, seed=3)
    want = latent_sample(model, params, sched, vae, state.params, n=2,
                         scale=1.5, kind="ddim", steps=4, seed=3)
    np.testing.assert_array_equal(got, want)
    assert os.path.exists(out)


# ---------- checkpoint + CLI pipeline ----------

def test_cli_latent_pipeline(tmp_path, capsys):
    """train-vae -> train --latent-vae -> sample-ddim --vae, end to end,
    plus load_vae roundtrip and the scale-in-meta contract."""
    from ddpm_diffusion_model_tpu.cli import main
    from ddpm_diffusion_model_tpu.training.checkpoint import read_meta
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    vae_ck = str(tmp_path / "vae_ck")
    main(["train-vae", "--out", vae_ck, "--data", "synthetic",
          "--synthetic-size", "16", "--img-size", str(RES),
          "--batch-size", "8", "--epochs", "1", "--base-channels", "8",
          "--channel-mults", "1,2", "--num-res-blocks", "1",
          "--latent-channels", "4", "--lr", "1e-3", "--warmup", "2"])
    out = capsys.readouterr().out
    vae_line = json.loads(out.strip().splitlines()[-1])
    assert vae_line["factor"] == 2 and vae_line["latent_resolution"] == 8

    vae, vstate, _meta = load_vae(vae_ck)
    assert vae.config.latent_channels == 4

    exp = ExperimentConfig(
        model=UNetConfig(in_channels=4, base_channels=8, channel_mults=(1, 2),
                         num_res_blocks=1, attn_resolutions=(),
                         time_embed_dim=16, num_heads=1, head_dim=8,
                         img_resolution=8),
        diffusion=DiffusionConfig(T=20, img_size=8, clamp_x0=False),
        train=TrainConfig(base_lr=1e-3, warmup_steps=2, grad_accum_steps=1),
        run_name="lat", img_size=8, batch_size=8, epochs=1,
        sample_every=1, sample_n=4, save_every=1,
    )
    cfg = str(tmp_path / "lat.json")
    with open(cfg, "w") as f:
        f.write(exp.to_json())
    ck = str(tmp_path / "ck")
    main(["train", "--config", cfg, "--data", "synthetic",
          "--synthetic-size", "16", "--ckpt-dir", ck,
          "--latent-vae", vae_ck])
    out = capsys.readouterr().out
    assert "[LATENT] corpus encoded" in out
    ckpt = os.path.join(ck, "lat_last")
    assert os.path.isdir(ckpt)
    # the per-epoch grid decoded to PIXEL resolution
    from PIL import Image

    grid = Image.open(os.path.join(ck, "lat_samples_e000.png"))
    assert grid.size[0] >= RES  # pixel grid, not an 8px latent grid
    # scale stored in the checkpoint meta
    meta = read_meta(ckpt)
    assert meta["configs"]["latent"]["scale"] > 0

    g = str(tmp_path / "g.png")
    main(["sample-ddim", "--config", cfg, "--ckpt", ckpt, "--ema",
          "--vae", vae_ck, "--n", "2", "--steps", "4", "--out", g])
    out = capsys.readouterr().out
    assert "[INFER-LATENT]" in out and os.path.exists(g)
    assert Image.open(g).size[0] >= RES

    # a mis-shaped config is refused up front
    bad = dataclasses.replace(
        exp, diffusion=DiffusionConfig(T=20, img_size=8, clamp_x0=True))
    bad_cfg = str(tmp_path / "bad.json")
    with open(bad_cfg, "w") as f:
        f.write(bad.to_json())
    with pytest.raises(ValueError, match="clamp_x0"):
        main(["train", "--config", bad_cfg, "--data", "synthetic",
              "--synthetic-size", "16", "--ckpt-dir", ck,
              "--latent-vae", vae_ck])

    # load_vae on a non-VAE checkpoint refuses cleanly
    with pytest.raises(ValueError, match="not a VAE checkpoint"):
        load_vae(ckpt)


def test_latent_preset_matches_64x_vae_contract():
    """The celeba64_latent preset is shaped for vae_64x_config's latents and
    passes check_latent_config (clamp_x0 off, channels/grid aligned); its
    model factory is exported."""
    from ddpm_diffusion_model_tpu.models import (
        unet_latent16_config,
        vae_64x_config,
    )
    from ddpm_diffusion_model_tpu.sampling import check_latent_config
    from ddpm_diffusion_model_tpu.utils.config import get_preset

    exp = get_preset("celeba64_latent")
    acfg = vae_64x_config()
    check_latent_config(exp.model, exp.diffusion, acfg)  # no raise
    assert exp.model == unet_latent16_config()
    assert not exp.diffusion.clamp_x0
    # round-trips through JSON like every preset
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    assert ExperimentConfig.from_json(exp.to_json()) == exp
