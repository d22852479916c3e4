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

__all__ = ["dpmpp2m_coefficients", "dpmpp2m_sample_loop"]


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
