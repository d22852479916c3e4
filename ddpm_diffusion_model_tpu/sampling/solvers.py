"""DPM-Solver++(2M): second-order multistep ODE sampler (beyond-reference).

The reference ships two samplers — the full ancestral chain
(``ddpm_inference.py``) and DDIM (``ddpim_inference.py:19-21``, 50-150 steps
for the 256px galleries).  DPM-Solver++(2M) (Lu et al. 2022,
arXiv:2211.01095, the data-prediction multistep variant) reaches DDIM-50
quality in ~15-25 model evaluations by treating the reverse process as the
probability-flow ODE in log-SNR time and reusing the previous step's
denoised estimate for a second-order correction — i.e. 2-3x cheaper
flagship 256px inference with zero extra model evals per step.

TPU shape: the whole trajectory is ONE ``lax.scan`` (like ``loops.py``).
Every per-step solver coefficient — the sigma ratio, alpha*(1-e^-h), the
multistep correction h_i/(2 h_{i-1}) — depends only on the static ladder
and the schedule table, so they are precomputed host-side in float64 and
enter the scan as compile-time-constant xs arrays; device work per step is
exactly one model eval plus a fused 3-term linear combination.  No branch
for the first/last step inside the trace: first-order fallbacks are encoded
by zeroing the correction coefficient host-side.

First-order consistency (tested): one DPM-Solver++ step with D = x0 equals
one DDIM eta=0 step exactly — alpha_next*e^{-h} = sigma_next*alpha_cur/
sigma_cur, so ``tests/test_solvers.py`` pins the 2-point ladder against
``ddim_step`` to fp tolerance.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.diffusion import EpsFn, predict_x0
from ..ops.schedules import DiffusionSchedule
from .timesteps import build_ddim_schedule

__all__ = [
    "dpmpp2m_coefficients",
    "dpmpp2m_sample_loop",
    "dpmpp2m_sde_coefficients",
    "dpmpp2m_sde_sample_loop",
]


def dpmpp2m_coefficients(
    sched: DiffusionSchedule,
    ts: np.ndarray,
    *,
    lower_order_final: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side per-transition coefficients for the ladder ``ts``.

    For each transition t_cur=ts[i] -> t_next=ts[i+1] (descending ladder),
    with lambda = log(alpha/sigma), h_i = lambda_next - lambda_cur > 0:

        x_next = c_skip * x + c_lin * D
        D      = x0 + corr * (x0 - x0_prev)

    where c_skip = sigma_next/sigma_cur, c_lin = alpha_next*(1 - e^{-h_i}),
    corr = h_i / (2 h_{i-1}) (the 2M correction; 0 on the first transition
    and — when ``lower_order_final`` — on the last, matching the standard
    implementations' guard against end-of-trajectory ringing).
    """
    ts = np.asarray(ts, dtype=np.int64)
    if ts.ndim != 1 or len(ts) < 2:
        raise ValueError(f"ladder needs >=2 descending entries, got {ts}")
    ab = np.asarray(sched.alphas_cumprod, np.float64)[ts]
    alpha = np.sqrt(ab)
    sigma = np.sqrt(1.0 - ab)
    lam = np.log(alpha) - np.log(sigma)
    h = lam[1:] - lam[:-1]  # > 0 on a descending ladder
    c_skip = sigma[1:] / sigma[:-1]
    c_lin = alpha[1:] * (-np.expm1(-h))
    corr = np.zeros_like(h)
    if len(h) > 1:
        corr[1:] = h[1:] / (2.0 * h[:-1])
    if lower_order_final and len(h) > 1:
        corr[-1] = 0.0
    return (c_skip.astype(np.float32), c_lin.astype(np.float32),
            corr.astype(np.float32))


def dpmpp2m_sample_loop(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    x_init: jnp.ndarray,
    *,
    timesteps: Optional[np.ndarray] = None,
    schedule_kind: str = "t_linear",
    steps: int = 20,
    clip_x0: Optional[bool] = None,
    lower_order_final: bool = True,
) -> jnp.ndarray:
    """Deterministic DPM-Solver++(2M) reverse loop x_T -> x_0, one scan.

    Same ladder/clip conventions as ``ddim_sample_loop`` (grid variant: the
    ladder's trailing 0 is a transition *target*, not an extra step).  The
    carry holds (x, previous denoised estimate); the first transition's
    correction coefficient is 0 so the zeros placeholder never contributes.
    """
    if clip_x0 is None:
        clip_x0 = sched.clamp_x0
    if timesteps is None:
        timesteps = build_ddim_schedule(
            schedule_kind, steps, sched.T,
            alphas_cumprod=np.asarray(sched.alphas_cumprod)
            if not isinstance(sched.alphas_cumprod, jax.core.Tracer) else None,
        )
    ts = np.asarray(timesteps, dtype=np.int32)
    if isinstance(sched.alphas_cumprod, jax.core.Tracer):
        # sched is an argument of an enclosing jit (e.g. _dpmpp_jit): build
        # the per-transition coefficients in-graph.  They are O(steps)
        # scalars computed once per trace — negligible next to one model
        # eval — and XLA hoists them out of the scan.
        ab = sched.alphas_cumprod[jnp.asarray(ts)]
        alpha, sigma = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
        lam = jnp.log(alpha) - jnp.log(sigma)
        h = lam[1:] - lam[:-1]
        c_skip = sigma[1:] / sigma[:-1]
        c_lin = alpha[1:] * (-jnp.expm1(-h))
        corr = jnp.zeros_like(h)
        if len(ts) > 2:
            tail = h[1:] / (2.0 * h[:-1])
            if lower_order_final:
                tail = tail.at[-1].set(0.0)
            corr = corr.at[1:].set(tail)
    else:
        c_skip, c_lin, corr = dpmpp2m_coefficients(
            sched, ts, lower_order_final=lower_order_final)

    B = x_init.shape[0]

    def body(carry, step):
        x, x0_prev = carry
        t_scalar, cs, cl, cc = step
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        eps = eps_fn(x, t)
        x0 = predict_x0(sched, x, eps, t)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        d = x0 + cc * (x0 - x0_prev)
        x = cs * x + cl * d
        return (x, x0), None

    xs = (
        jnp.asarray(ts[:-1]),
        jnp.asarray(c_skip),
        jnp.asarray(c_lin),
        jnp.asarray(corr),
    )
    (x, _), _ = jax.lax.scan(body, (x_init, jnp.zeros_like(x_init)), xs)
    return x


def dpmpp2m_sde_coefficients(
    sched: DiffusionSchedule,
    ts: np.ndarray,
    *,
    lower_order_final: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side per-transition coefficients for SDE-DPM-Solver++(2M)
    (Lu et al. 2022 §4 SDE variant; the 'midpoint' multistep form shipped
    by the standard schedulers).  For t_cur -> t_next with
    h = lambda_next - lambda_cur > 0:

        x_next = c_skip * x + c_lin * D + c_noise * z,   z ~ N(0, I)
        D      = x0 + corr * (x0 - x0_prev)

    with c_skip = (sigma_next/sigma_cur) * e^{-h}
         c_lin  = alpha_next * (1 - e^{-2h})
         corr   = h / (2 h_{i-1})            (0 first / last as in the ODE)
         c_noise= sigma_next * sqrt(1 - e^{-2h})

    Exactness invariant (tested): c_skip^2 * sigma_cur^2 + c_noise^2
    = sigma_next^2 — for a delta data distribution the sampler reproduces
    the true marginals N(alpha_t c, sigma_t^2) EXACTLY at any step count,
    which is the falsifiable statistical test in ``tests/test_solvers.py``.
    """
    ts = np.asarray(ts, dtype=np.int64)
    if ts.ndim != 1 or len(ts) < 2:
        raise ValueError(f"ladder needs >=2 descending entries, got {ts}")
    ab = np.asarray(sched.alphas_cumprod, np.float64)[ts]
    alpha = np.sqrt(ab)
    sigma = np.sqrt(1.0 - ab)
    lam = np.log(alpha) - np.log(sigma)
    h = lam[1:] - lam[:-1]  # > 0 on a descending ladder
    c_skip = (sigma[1:] / sigma[:-1]) * np.exp(-h)
    c_lin = alpha[1:] * (-np.expm1(-2.0 * h))
    c_noise = sigma[1:] * np.sqrt(-np.expm1(-2.0 * h))
    corr = np.zeros_like(h)
    if len(h) > 1:
        corr[1:] = h[1:] / (2.0 * h[:-1])
    if lower_order_final and len(h) > 1:
        corr[-1] = 0.0
    return (c_skip.astype(np.float32), c_lin.astype(np.float32),
            corr.astype(np.float32), c_noise.astype(np.float32))


def dpmpp2m_sde_sample_loop(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    x_init: jnp.ndarray,
    key: jax.Array,
    *,
    timesteps: Optional[np.ndarray] = None,
    schedule_kind: str = "t_linear",
    steps: int = 20,
    clip_x0: Optional[bool] = None,
    lower_order_final: bool = True,
) -> jnp.ndarray:
    """Stochastic SDE-DPM-Solver++(2M) reverse loop x_T -> x_0, one scan.

    The stochastic sibling of :func:`dpmpp2m_sample_loop` — same ladder /
    clip conventions and the same one-model-eval-per-step cost, plus one
    fused Gaussian draw.  Stochasticity matters at low NFE the way DDIM
    eta>0 does for the ancestral chain: it re-injects the noise the coarse
    ladder under-resolves instead of committing to the ODE trajectory.
    Per-step noise comes from ``jax.random.fold_in(key, i)`` so the scan
    carries no PRNG state.
    """
    if clip_x0 is None:
        clip_x0 = sched.clamp_x0
    if timesteps is None:
        timesteps = build_ddim_schedule(
            schedule_kind, steps, sched.T,
            alphas_cumprod=np.asarray(sched.alphas_cumprod)
            if not isinstance(sched.alphas_cumprod, jax.core.Tracer) else None,
        )
    ts = np.asarray(timesteps, dtype=np.int32)
    if isinstance(sched.alphas_cumprod, jax.core.Tracer):
        # in-graph coefficient build (sched is a jit argument) — O(steps)
        # scalars, hoisted out of the scan by XLA; see dpmpp2m_sample_loop.
        ab = sched.alphas_cumprod[jnp.asarray(ts)]
        alpha, sigma = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
        lam = jnp.log(alpha) - jnp.log(sigma)
        h = lam[1:] - lam[:-1]
        c_skip = (sigma[1:] / sigma[:-1]) * jnp.exp(-h)
        c_lin = alpha[1:] * (-jnp.expm1(-2.0 * h))
        c_noise = sigma[1:] * jnp.sqrt(-jnp.expm1(-2.0 * h))
        corr = jnp.zeros_like(h)
        if len(ts) > 2:
            tail = h[1:] / (2.0 * h[:-1])
            if lower_order_final:
                tail = tail.at[-1].set(0.0)
            corr = corr.at[1:].set(tail)
    else:
        c_skip, c_lin, corr, c_noise = dpmpp2m_sde_coefficients(
            sched, ts, lower_order_final=lower_order_final)

    B = x_init.shape[0]

    def body(carry, step):
        x, x0_prev = carry
        i, t_scalar, cs, cl, cc, cn = step
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        eps = eps_fn(x, t)
        x0 = predict_x0(sched, x, eps, t)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        d = x0 + cc * (x0 - x0_prev)
        z = jax.random.normal(jax.random.fold_in(key, i), x.shape,
                              dtype=x.dtype)
        x = cs * x + cl * d + cn * z
        return (x, x0), None

    xs = (
        jnp.arange(len(ts) - 1, dtype=jnp.uint32),
        jnp.asarray(ts[:-1]),
        jnp.asarray(c_skip),
        jnp.asarray(c_lin),
        jnp.asarray(corr),
        jnp.asarray(c_noise),
    )
    (x, _), _ = jax.lax.scan(body, (x_init, jnp.zeros_like(x_init)), xs)
    return x
