"""Latent-diffusion sampling + corpus encoding (LDM glue).

The pixel-space stack needs nothing new to diffuse in latent space — a
latent is just an NHWC array with ``in_channels = latent_channels`` — so
this module is deliberately thin: encode a corpus once (so training stays
the standard loop on a plain array source, device-cacheable like any other
corpus), sample latents with the standard compiled loops, decode the result
through the VAE (models/autoencoder.py).

One real semantic difference from pixels: latents are NOT bounded to
[-1, 1], so the latent run's ``DiffusionConfig`` must set
``clamp_x0: false`` and the sampler wrappers here thread
``clip_x0=sched.clamp_x0`` instead of the pixel paths' hardcoded clamp
(sampling/inference.py:151).  :func:`check_latent_config` enforces the
whole contract in one place.
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.autoencoder import AutoEncoderKL
from ..training.vae import vae_decode_fn, vae_encode_fn
from .inference import cfg_eps_fn
from .loops import ddim_sample_loop, ddpm_sample_loop, to_unit_interval
from .solvers import dpmpp2m_sample_loop
from .timesteps import build_ddim_schedule

__all__ = [
    "check_latent_config",
    "encode_corpus",
    "latent_sample",
    "make_latent_sample_fn",
]


def check_latent_config(exp_model, exp_diffusion, acfg) -> None:
    """The latent run's experiment config must be latent-shaped:
    denoiser channels == VAE latent channels, grid == VAE latent grid,
    and NO x0 clamping (latents are unbounded)."""
    if int(exp_model.in_channels) != int(acfg.latent_channels):
        raise ValueError(
            f"latent training: model.in_channels ({exp_model.in_channels}) "
            f"must equal the VAE's latent_channels ({acfg.latent_channels})")
    if int(exp_model.img_resolution) != int(acfg.latent_resolution):
        raise ValueError(
            f"latent training: model.img_resolution "
            f"({exp_model.img_resolution}) must equal the VAE's latent grid "
            f"({acfg.latent_resolution} = {acfg.img_resolution}/"
            f"{acfg.factor})")
    if exp_diffusion.clamp_x0 or exp_diffusion.dynamic_threshold is not None:
        raise ValueError(
            "latent training: set diffusion.clamp_x0=false and "
            "dynamic_threshold=null — latents are not bounded to [-1, 1]")


def encode_corpus(
    vae: AutoEncoderKL,
    vae_params,
    source: Iterable,
    *,
    scale: Optional[float] = None,
    batch_size: int = 64,
) -> tuple[np.ndarray, float]:
    """Encode a corpus (array or loader of [-1,1] images, labels dropped)
    into diffusion-ready latents.  Returns ``(latents, scale)`` — when
    ``scale`` is None it is computed from the FIRST batch's posterior-mean
    std (:func:`~..models.autoencoder.latent_scale_factor`) and then held
    fixed for the rest, so one pass suffices and every batch shares the
    normalization the decoder will invert."""
    from ..models.autoencoder import latent_scale_factor

    def batches():
        if isinstance(source, np.ndarray):
            for i in range(0, len(source), batch_size):
                yield source[i:i + batch_size]
        else:
            for b in source:
                yield np.asarray(
                    b[0] if isinstance(b, (tuple, list)) else b, np.float32)

    mean_fn = jax.jit(lambda x: vae.apply(
        vae_params, x, method=AutoEncoderKL.encode)[0])
    out, used_scale = [], scale
    for x in batches():
        mean = mean_fn(jnp.asarray(x, jnp.float32))
        if used_scale is None:
            used_scale = latent_scale_factor(mean)
        out.append(np.asarray(mean, np.float32) * used_scale)
    if not out:
        raise ValueError("encode_corpus: empty source")
    return np.concatenate(out), float(used_scale)


@functools.partial(
    jax.jit,
    static_argnames=("model", "vae", "shape", "kind", "timesteps",
                     "num_steps", "guidance"),
)
def _latent_sample_jit(model, params, sched, vae, vae_params, key, shape,
                       kind, timesteps, num_steps, eta, scale,
                       y=None, guidance=1.0):
    """Sample latents with the standard loops (clip_x0 = sched.clamp_x0 —
    False for a well-formed latent config), then decode in the same program
    so nothing ever leaves the device between denoise and decode."""
    k_init, k_loop = jax.random.split(key)
    z = jax.random.normal(k_init, shape, dtype=jnp.float32)
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    clip = sched.clamp_x0
    if kind == "ddpm":
        z, _ = ddpm_sample_loop(sched, eps_fn, z, k_loop,
                                num_steps=num_steps, clip_x0=clip)
    elif kind == "ddim":
        z, _ = ddim_sample_loop(
            sched, eps_fn, z, k_loop,
            timesteps=np.asarray(timesteps, np.int32), eta=eta,
            clip_x0=clip)
    elif kind == "dpmpp":
        z = dpmpp2m_sample_loop(
            sched, eps_fn, z, timesteps=np.asarray(timesteps, np.int32),
            clip_x0=clip)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    x = vae_decode_fn(vae, vae_params, scale=scale)(z)
    return to_unit_interval(x)


def latent_sample(
    model, params, sched, vae, vae_params, *,
    n: int, scale: float, kind: str = "ddim", steps: int = 50,
    eta: float = 0.0, schedule_kind: str = "t_linear", seed: int = 0,
    class_id=None, guidance: float = 1.0, save_path: Optional[str] = None,
) -> np.ndarray:
    """Generate ``n`` images: latent denoise (ddpm | ddim | dpmpp) + VAE
    decode, one jitted program.  Returns (n, H, W, C) float [0, 1] and
    optionally saves the usual grid PNG."""
    acfg = vae.config
    shape = (n, acfg.latent_resolution, acfg.latent_resolution,
             acfg.latent_channels)
    ts = (None if kind == "ddpm" else tuple(
        int(t) for t in build_ddim_schedule(
            schedule_kind, steps, sched.T,
            alphas_cumprod=np.asarray(sched.alphas_cumprod))))
    label = None
    if class_id is not None:
        arr = np.asarray(class_id, np.int32)
        label = (jnp.full((n,), int(arr), jnp.int32) if arr.ndim == 0
                 else jnp.asarray(arr.reshape(n)))
    x01 = _latent_sample_jit(
        model, params, sched, vae, vae_params, jax.random.key(seed), shape,
        kind, ts, None if kind != "ddpm" else int(sched.T), float(eta),
        float(scale), y=label, guidance=float(guidance))
    imgs = np.asarray(x01)
    if save_path:
        from ..utils.images import save_image_grid

        save_image_grid(imgs, save_path)
    return imgs


def make_latent_sample_fn(vae, vae_params, scale: float, kind: str = "ddim",
                          steps: int = 50):
    """A ``sample_fn`` for ``train_ddpm(sample_fn=...)``: the per-epoch
    sample hook decodes latent grids to PIXEL grids, so in-training visual
    monitoring shows images, not 4-channel latents."""

    def sample_fn(model, params, sched, *, n, img_size, save_path, seed):
        del img_size  # latent grid comes from the VAE config
        return latent_sample(
            model, params, sched, vae, vae_params, n=n, scale=scale,
            kind=kind, steps=steps, seed=seed, save_path=save_path)

    return sample_fn
