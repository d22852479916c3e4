"""Convolutional KL-VAE for latent diffusion (LDM / Stable-Diffusion recipe).

The reference diffuses in pixel space only (``src/model/unet_backbone.py``);
this adds the latent family: a small Gaussian autoencoder compresses images
f× per side into a ``latent_channels``-deep latent, the standard diffusion
stack then trains/samples UNCHANGED on those latents (they're just NHWC
arrays with ``in_channels = latent_channels``), and samples decode back to
pixels.  At f=4 a 256px model does its 1000-step denoising on 64×64 grids —
the compute win that made high-resolution diffusion practical
(Rombach et al. 2022).

TPU shape: NHWC, bf16 compute / fp32 params, fp32 GN stats (same conventions
as the denoisers, models/blocks.py); stride-2 convs down, nearest×2-broadcast
+ conv up; no attention (at these latent sizes the conv stack dominates and
stays MXU-bound).  The encoder emits (mean, logvar) of a diagonal Gaussian
posterior; KL to N(0, I) regularizes the latent so diffusion's terminal
N(0, I) matches the latent distribution after :func:`latent_scale_factor`
rescaling.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import group_norm

__all__ = [
    "AutoEncoderConfig",
    "AutoEncoderKL",
    "gaussian_posterior_sample",
    "posterior_kl",
    "latent_scale_factor",
    "vae_16x_config",
    "vae_64x_config",
]


@dataclasses.dataclass(frozen=True)
class AutoEncoderConfig:
    """Downsample factor is ``2 ** (len(channel_mults) - 1)`` — one stride-2
    step between consecutive mults, none after the last."""

    in_channels: int = 3
    base_channels: int = 32
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 1
    latent_channels: int = 4
    img_resolution: int = 64

    @property
    def factor(self) -> int:
        return 1 << (len(self.channel_mults) - 1)

    @property
    def latent_resolution(self) -> int:
        if self.img_resolution % self.factor:
            raise ValueError(
                f"img_resolution {self.img_resolution} not divisible by the "
                f"autoencoder factor {self.factor}")
        return self.img_resolution // self.factor


class _VAEResBlock(nn.Module):
    """GN→SiLU→3×3 → GN→SiLU→3×3 with identity/1×1 skip — the denoiser
    ResBlock (blocks.py:110) minus the time-bias seam (a VAE has no t)."""

    out_ch: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = group_norm(x.shape[-1], dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = group_norm(self.out_ch, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="skip")(x)
        return x + h


class Encoder(nn.Module):
    config: AutoEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        h = nn.Conv(cfg.base_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(x.astype(self.dtype))
        for i, mult in enumerate(cfg.channel_mults):
            ch = cfg.base_channels * mult
            for j in range(cfg.num_res_blocks):
                h = _VAEResBlock(ch, self.dtype, name=f"down{i}_block{j}")(h)
            if i != len(cfg.channel_mults) - 1:
                # stride-2 conv, torch-style asymmetric pad (blocks.py:232)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"down{i}_pool")(h)
        h = group_norm(h.shape[-1], dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        # fp32 head: the posterior's (mean, logvar) parameterize a density —
        # keep them full precision like the GN stats
        out = nn.Conv(2 * cfg.latent_channels, (3, 3), padding="SAME",
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      name="head")(h.astype(jnp.float32))
        mean, logvar = jnp.split(out, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    config: AutoEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        mults = tuple(reversed(cfg.channel_mults))
        h = nn.Conv(cfg.base_channels * mults[0], (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(z.astype(self.dtype))
        for i, mult in enumerate(mults):
            ch = cfg.base_channels * mult
            for j in range(cfg.num_res_blocks):
                h = _VAEResBlock(ch, self.dtype, name=f"up{i}_block{j}")(h)
            if i != len(mults) - 1:
                # nearest ×2 as a broadcast-reshape (blocks.py:254)
                B, H, W, C = h.shape
                h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                     (B, H, 2, W, 2, C))
                h = h.reshape(B, 2 * H, 2 * W, C)
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"up{i}_conv")(h)
        h = group_norm(h.shape[-1], dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        out = nn.Conv(cfg.in_channels, (3, 3), padding="SAME",
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      name="head")(h.astype(jnp.float32))
        return out  # unbounded; recon loss pulls it into [-1, 1]


class AutoEncoderKL(nn.Module):
    """``encode(x) -> (mean, logvar)``; ``decode(z) -> x_hat``; calling the
    module runs the full VAE pass (used by init and the train step)."""

    config: AutoEncoderConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)

    def __call__(self, x, key=None):
        mean, logvar = self.encoder(x)
        z = (mean if key is None
             else gaussian_posterior_sample(key, mean, logvar))
        return self.decoder(z), mean, logvar

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)


def gaussian_posterior_sample(key: jax.Array, mean: jnp.ndarray,
                              logvar: jnp.ndarray) -> jnp.ndarray:
    """Reparameterized draw z = mean + exp(logvar/2) * eps."""
    eps = jax.random.normal(key, mean.shape, jnp.float32)
    return mean + jnp.exp(0.5 * logvar) * eps


def posterior_kl(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL( N(mean, e^logvar) || N(0, I) ) per sample, summed over the latent
    -> (B,) nats.  Closed form: 0.5 Σ (mean² + e^logvar − 1 − logvar)."""
    kl = 0.5 * (jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar)
    return jnp.sum(kl, axis=tuple(range(1, kl.ndim)))


def latent_scale_factor(mean: jnp.ndarray) -> float:
    """1 / std of a batch of posterior means — multiply latents by this so
    diffusion sees ~unit-variance inputs (SD's 0.18215, recomputed for OUR
    autoencoder instead of inherited).  Store it next to the diffusion run
    (the CLI writes it into the experiment config) — decode divides it out.
    """
    return float(1.0 / (jnp.std(mean.astype(jnp.float32)) + 1e-8))


def vae_16x_config(**kw) -> AutoEncoderConfig:
    """Tiny f=2 config for tests (16px -> 8px latents)."""
    return AutoEncoderConfig(base_channels=16, channel_mults=(1, 2),
                             num_res_blocks=1, latent_channels=4,
                             img_resolution=16, **kw)


def vae_64x_config(**kw) -> AutoEncoderConfig:
    """f=4: 64px images -> 16×16×4 latents (48× fewer pixels-equivalents
    than 64×64×3; the 64px denoiser then runs at its 16px-level cost)."""
    return AutoEncoderConfig(base_channels=64, channel_mults=(1, 2, 4),
                             num_res_blocks=2, latent_channels=4,
                             img_resolution=64, **kw)
