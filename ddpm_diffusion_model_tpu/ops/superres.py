"""Super-resolution conditioning ops (SR3 / cascaded-diffusion style).

Capability BEYOND the reference: the reference trains its 64px and 256px
models as UNRELATED unconditional runs (``README.md`` galleries; the CelebHQ
notebook is just a bigger config), so a user wanting 256px output pays the
full 256px generation cost and gets no say in the content.  A cascade
(Ho et al. 2022, "Cascaded Diffusion Models"; Saharia et al. 2021, SR3)
instead trains the big model as a *conditional upsampler*: the denoiser sees
the low-resolution image (bilinearly upsampled to the target grid) as extra
input channels and learns p(x_hr | x_lr).  Generation composes the cheap
64px base model with the upsampler — and editing/class control done at 64px
carries through the cascade.

These are the pure conditioning ops shared by the train loss
(``training/step.py``) and the samplers (``sampling/superres.py``):

- :func:`degrade` — area-style antialiased downsample by an integer factor
  (the self-supervised "low-res view" of a training batch).
- :func:`upsample_cond` — bilinear resize of a low-res batch onto the model
  grid; what the network actually consumes as ``x_cond``.
- :func:`build_cond` — ``upsample_cond(degrade(x))``: the train-time
  conditioning derived from the high-res batch itself.
- :func:`aug_cond` — Gaussian conditioning augmentation (CDM §3.2 "truncated
  conditioning augmentation" in its simplest non-truncated form): during
  training the cond is perturbed with per-sample sigma ~ U[0, aug], teaching
  the upsampler robustness to the base model's imperfect outputs.

All shapes are static and everything lowers to ``jax.image.resize`` gathers
+ elementwise ops that XLA fuses; nothing here allocates at sample time
beyond the cond tensor itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["degrade", "upsample_cond", "build_cond", "aug_cond"]


def degrade(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, C) antialiased bilinear downsample."""
    f = int(factor)
    B, H, W, C = x.shape
    if f < 2:
        raise ValueError(f"superres factor must be >= 2, got {factor}")
    if H % f or W % f:
        raise ValueError(f"spatial dims {(H, W)} not divisible by factor {f}")
    return jax.image.resize(x, (B, H // f, W // f, C), method="linear",
                            antialias=True)


def upsample_cond(low: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """(B, h, w, C) -> (B, out_size, out_size, C) bilinear upsample — the
    conditioning tensor the denoiser concatenates to x_t."""
    B, h, w, C = low.shape
    s = int(out_size)
    if h > s or w > s:
        raise ValueError(f"low-res input {(h, w)} larger than target {s}")
    return jax.image.resize(low, (B, s, s, C), method="linear")


def build_cond(x_hr: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Training-time conditioning: the high-res batch's own low-res view,
    resized back onto the model grid (same shape as ``x_hr``)."""
    return upsample_cond(degrade(x_hr, factor), x_hr.shape[1])


def aug_cond(key: jax.Array, cond: jnp.ndarray, aug: float) -> jnp.ndarray:
    """Gaussian conditioning augmentation: per-sample sigma ~ U[0, aug].

    ``aug <= 0`` returns ``cond`` unchanged (and burns no randomness —
    the RNG stream of aug-free runs is independent of this knob).
    """
    a = float(aug)
    if a <= 0.0:
        return cond
    k_s, k_n = jax.random.split(key)
    B = cond.shape[0]
    sigma = jax.random.uniform(k_s, (B,), minval=0.0, maxval=a)
    sigma = sigma.reshape((B,) + (1,) * (cond.ndim - 1))
    noise = jax.random.normal(k_n, cond.shape, dtype=cond.dtype)
    return cond + sigma * noise
