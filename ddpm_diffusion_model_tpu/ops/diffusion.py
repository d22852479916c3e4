"""Core DDPM/DDIM math as pure, jit-friendly functions over a schedule pytree.

TPU-native redesign of the reference's ``Diffusion`` methods
(``src/model/difussion_class.py:72-234``): no module state, no ``@no_grad``
context — every function is pure (inputs -> outputs), takes the frozen
:class:`~ddpm_diffusion_model_tpu.ops.schedules.DiffusionSchedule` pytree
first, and composes under ``jax.jit`` / ``jax.lax.scan`` / ``jax.grad``.
The denoiser enters only as an injected callable ``eps_fn(x_t, t) -> eps_hat``
— the same abstraction boundary the reference keeps (``difussion_class.py:97``).

All arrays are NHWC (TPU conv-native); the math itself is layout-agnostic
(reductions run over all non-batch axes).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule, extract

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

__all__ = [
    "sample_timesteps",
    "q_sample",
    "loss_simple",
    "prediction_target",
    "model_output_to_eps",
    "predict_x0",
    "posterior_mean_variance",
    "p_sample_step",
    "ddim_step",
]


def sample_timesteps(key: jax.Array, batch_size: int, T: int) -> jnp.ndarray:
    """t ~ Uniform{1..T-1}; deliberately excludes t=0 from training, matching
    ``difussion_class.py:72-78``."""
    return jax.random.randint(key, (batch_size,), 1, T, dtype=jnp.int32)


def q_sample(
    sched: DiffusionSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
) -> jnp.ndarray:
    """Forward process: x_t = sqrt(ab_t) * x0 + sqrt(1-ab_t) * eps.

    Parity: ``difussion_class.py:81-91``.  ``eps`` is explicit (JAX threads
    RNG keys; there is no global generator to default to).
    """
    sqrt_ab = extract(sched.sqrt_alphas_cumprod, t, x0.ndim)
    sqrt_omb = extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
    return sqrt_ab * x0 + sqrt_omb * eps


def prediction_target(
    sched: DiffusionSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Regression target in the network's NATIVE output space.

    - "epsilon": the noise itself (the reference's only mode,
      ``difussion_class.py:95-116``)
    - "v": v = sqrt(ab_t) eps - sqrt(1-ab_t) x0 (Salimans & Ho 2022) —
      bounded at every t, the modern default for high-res / distillation
    - "x0": the clean image
    - "flow": the flow-matching velocity u = eps - x0 (rectified flow,
      Liu et al. 2023) — t-independent target; pair with schedule="rf"
      (ops/schedules.py beta_schedule_rf) for the linear-interpolant
      marginals this velocity field transports
    """
    kind = sched.prediction_type
    if kind == "epsilon":
        return noise
    if kind == "x0":
        return x0
    if kind == "flow":
        return noise - x0
    if kind == "v":
        sqrt_ab = extract(sched.sqrt_alphas_cumprod, t, x0.ndim)
        sqrt_omb = extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
        return sqrt_ab * noise - sqrt_omb * x0
    raise ValueError(f"unknown prediction_type {kind!r}")


def model_output_to_eps(
    sched: DiffusionSchedule,
    out: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Convert a network output in the schedule's native space back to an
    eps estimate — the inverse of :func:`prediction_target` given x_t.

    Affine in ``out`` at fixed (x_t, t), so classifier-free guidance
    combines identically before or after this conversion.  Every sampler
    consumes eps; wrapping this once at the eps_fn boundary keeps the whole
    sampling stack parameterization-agnostic.

    - "v":  eps = sqrt(ab_t) v + sqrt(1-ab_t) x_t
            (from x_t = sqrt(ab) x0 + sqrt(1-ab) eps)
    - "x0": eps = (x_t - sqrt(ab_t) x0_hat) / sqrt(1-ab_t); t=0 has
            sqrt(1-ab) ~= sqrt(beta_0) > 0, and samplers never divide
            by an exactly-zero coefficient on the trained range
    - "flow": from u = eps - x0 and x_t = a x0 + b eps:
            eps = (x_t + a u) / (a + b) — a + b >= 1 for any schedule,
            so no epsilon guard is needed
    """
    kind = sched.prediction_type
    if kind == "epsilon":
        return out
    sqrt_ab = extract(sched.sqrt_alphas_cumprod, t, x_t.ndim)
    sqrt_omb = extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
    if kind == "v":
        return sqrt_ab * out + sqrt_omb * x_t
    if kind == "x0":
        return (x_t - sqrt_ab * out) / (sqrt_omb + 1e-12)
    if kind == "flow":
        return (x_t + sqrt_ab * out) / (sqrt_ab + sqrt_omb)
    raise ValueError(f"unknown prediction_type {kind!r}")


def loss_simple(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """L_simple: E[ ||target - net(x_t, t)||^2 ], per-sample MSE over all
    non-batch dims, optional per-sample weight, then batch mean.

    Parity: ``difussion_class.py:95-116``.  The MSE is accumulated in float32
    even when the model computes in bfloat16 so the loss/gradient signal keeps
    full precision (the reference relies on torch autocast doing the same).

    Under ``sched.prediction_type != "epsilon"`` the regression runs in the
    network's native space (target from :func:`prediction_target`) — the
    standard formulation for v-/x0-prediction; for "epsilon" this is exactly
    the reference's loss.
    """
    x_t = q_sample(sched, x0, t, noise)
    eps_pred = eps_fn(x_t, t)
    target = prediction_target(sched, x0, t, noise)
    diff = (target - eps_pred).astype(jnp.float32)
    reduce_axes = tuple(range(1, x0.ndim))
    mse = jnp.mean(diff * diff, axis=reduce_axes)
    if weight is not None:
        mse = mse * weight
    return jnp.mean(mse)


def predict_x0(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    eps_pred: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Reconstruct x0_hat = (x_t - sqrt(1-ab_t) * eps_hat) / (sqrt(ab_t)+1e-12),
    then dynamic thresholding *or* plain clamp.

    Parity — including the reference's quirky thresholding variant
    (``difussion_class.py:132-152``), which is NOT the Imagen-paper quantile
    version: amax = per-sample max |x0_hat| floored at 1.0, divide by
    max(amax, s), then clamp to [-1, 1].
    """
    sqrt_ab = extract(sched.sqrt_alphas_cumprod, t, x_t.ndim)
    sqrt_omb = extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
    x0_hat = (x_t - sqrt_omb * eps_pred) / (sqrt_ab + 1e-12)

    if sched.dynamic_threshold is not None:
        s = sched.dynamic_threshold
        reduce_axes = tuple(range(1, x_t.ndim))
        amax = jnp.max(jnp.abs(x0_hat), axis=reduce_axes)  # (B,)
        amax = jnp.maximum(amax, 1.0)
        divisor = jnp.clip(amax, s, None).reshape(amax.shape[0], *([1] * (x_t.ndim - 1)))
        x0_hat = jnp.clip(x0_hat / divisor, -1.0, 1.0)
    elif sched.clamp_x0:
        x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
    return x0_hat


def posterior_mean_variance(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    x0_hat: jnp.ndarray,
    t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mean, var, logvar of q(x_{t-1} | x_t, x0_hat).

    Parity: ``difussion_class.py:120-130``.
    """
    coef1 = extract(sched.posterior_mean_coef1, t, x_t.ndim)
    coef2 = extract(sched.posterior_mean_coef2, t, x_t.ndim)
    mean = coef1 * x0_hat + coef2 * x_t
    var = extract(sched.posterior_variance, t, x_t.ndim)
    logvar = extract(sched.posterior_log_variance, t, x_t.ndim)
    return mean, var, logvar


def p_sample_step(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    clip_x0: Optional[bool] = None,
) -> jnp.ndarray:
    """One DDPM ancestral step: x_{t-1} = mu + 1[t>0] * exp(0.5 logvar) * z.

    Parity: ``difussion_class.py:156-187`` (including the double clamp when
    ``clip_x0`` and ``clamp_x0`` are both set — harmless, kept for parity).
    ``noise`` is explicit so a ``lax.scan`` caller controls the RNG stream.
    """
    if clip_x0 is None:
        clip_x0 = sched.clamp_x0
    eps_pred = eps_fn(x_t, t)
    x0_hat = predict_x0(sched, x_t, eps_pred, t)
    if clip_x0:
        x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
    mean, _var, logvar = posterior_mean_variance(sched, x_t, x0_hat, t)
    nonzero = (t > 0).astype(x_t.dtype).reshape(x_t.shape[0], *([1] * (x_t.ndim - 1)))
    return mean + nonzero * jnp.exp(0.5 * logvar) * noise


def ddim_step(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    noise: jnp.ndarray,
    eta: float = 0.0,
    clip_x0: Optional[bool] = None,
) -> jnp.ndarray:
    """One DDIM step t -> t_prev (deterministic for eta=0).

        x_prev = sqrt(ab') x0_hat
               + sqrt(max(1 - ab' - sigma^2, 0)) * dir
               + sigma * z
        dir    = (x_t - sqrt(ab_t) x0_hat) / sqrt(1 - ab_t + 1e-12)
        sigma  = eta * sqrt((1-ab')/(1-ab_t+1e-12)) * sqrt(1 - ab_t/(ab'+1e-12))

    Parity: ``difussion_class.py:189-234`` (same epsilon guards and clamp).
    """
    if clip_x0 is None:
        clip_x0 = sched.clamp_x0

    a_t = extract(sched.alphas_cumprod, t, x_t.ndim)
    a_prev = extract(sched.alphas_cumprod, t_prev, x_t.ndim)

    eps_pred = eps_fn(x_t, t)
    x0_hat = predict_x0(sched, x_t, eps_pred, t)
    if clip_x0:
        x0_hat = jnp.clip(x0_hat, -1.0, 1.0)

    dir_xt = (x_t - jnp.sqrt(a_t) * x0_hat) / jnp.sqrt(1.0 - a_t + 1e-12)
    sigma = (
        eta
        * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t + 1e-12))
        * jnp.sqrt(1.0 - a_t / (a_prev + 1e-12))
    )
    mean = jnp.sqrt(a_prev) * x0_hat
    add = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0, None)) * dir_xt
    return mean + add + sigma * noise
