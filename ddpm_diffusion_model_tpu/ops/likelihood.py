"""Exact variational-bound likelihood (bits/dim) for trained denoisers.

The reference has no likelihood path at all (its eval is L_simple +
eyeballing sample grids, ``src/training_loops/main_train_loop.py:48``); this
implements the full DDPM variational bound (Ho et al. 2020, Eq. 5):

    L_vlb = E_q[ L_T + sum_{t>0} L_{t-1} + L_0 ]          (nats)
    L_T     = KL( q(x_T | x_0) || N(0, I) )                 (prior term)
    L_{t-1} = KL( q(x_{t-1}|x_t, x_0) || p(x_{t-1}|x_t) )   (per-step KL)
    L_0     = -log p(x_0 | x_1)                             (discretized
                                                             decoder)

so a checkpoint gets a proper test-set bits/dim number — the standard
falsifiable quality metric that needs NO external weights or data (unlike
FID), which matters in a zero-egress deployment.

Conventions match the sampler exactly: ``p(x_{t-1}|x_t)`` has the mean the
ancestral sampler uses (``predict_x0`` incl. its clamp/threshold behavior +
``posterior_mean_variance``) and the FIXED posterior variance
``p_sample_step`` draws with — so the bound scores the actual generative
model being sampled from, not a different variance choice.  The decoder
variance at t=0 uses posterior_variance[1] (index 0 is clipped to 1e-20 in
the schedule and would be degenerate; same convention as the standard DDPM
codebases).

TPU shape: the T-term sum is ONE ``lax.scan`` over t with a fresh
``q_sample`` draw per term (keys via ``fold_in`` — deterministic given one
key), one model eval per term, everything batched; ``vlb_bits_per_dim_mc``
is the unbiased uniform-t subsample estimator for cheap evals.  Works with
any ``eps_fn`` from :func:`~..sampling.inference.cfg_eps_fn`, so CFG /
v-prediction / x0-prediction / SR conditioning all score through the same
code path.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .diffusion import posterior_mean_variance, predict_x0, q_sample
from .schedules import DiffusionSchedule, extract

__all__ = [
    "gaussian_kl",
    "discretized_gaussian_log_likelihood",
    "prior_kl",
    "vlb_term",
    "vlb_bits_per_dim",
    "vlb_bits_per_dim_mc",
]

_LN2 = math.log(2.0)


def _mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean over all non-batch dims -> (B,) nats/dim."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def gaussian_kl(mean1: jnp.ndarray, logvar1, mean2: jnp.ndarray,
                logvar2) -> jnp.ndarray:
    """Elementwise KL( N(mean1, e^logvar1) || N(mean2, e^logvar2) ), nats.

    logvars may be scalars or broadcastable arrays.  All math in fp32.
    """
    mean1 = mean1.astype(jnp.float32)
    mean2 = mean2.astype(jnp.float32)
    logvar1 = jnp.asarray(logvar1, jnp.float32)
    logvar2 = jnp.asarray(logvar2, jnp.float32)
    return 0.5 * (
        logvar2 - logvar1 - 1.0
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


def _std_normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.float32(2.0))))


def discretized_gaussian_log_likelihood(
    x: jnp.ndarray, means: jnp.ndarray, log_scales,
) -> jnp.ndarray:
    """Elementwise log p(x) where p is N(means, e^{2 log_scales}) integrated
    over the uint8 pixel bin around ``x`` (images live in [-1, 1], so bins
    are 2/255 wide; the edge bins absorb the tails).  nats, fp32.
    """
    x = x.astype(jnp.float32)
    means = means.astype(jnp.float32)
    inv_std = jnp.exp(-jnp.asarray(log_scales, jnp.float32))
    centered = x - means
    cdf_plus = _std_normal_cdf(inv_std * (centered + 1.0 / 255.0))
    cdf_min = _std_normal_cdf(inv_std * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    log_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, 1e-12, None))
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, log_delta))


def prior_kl(sched: DiffusionSchedule, x0: jnp.ndarray) -> jnp.ndarray:
    """L_T = KL( q(x_T|x_0) || N(0, I) ) per sample, nats/dim -> (B,).

    q(x_T|x_0) = N( sqrt(ab_T) x_0, (1 - ab_T) I ) in closed form.
    """
    ab_T = sched.alphas_cumprod[-1]
    mean = jnp.sqrt(ab_T) * x0.astype(jnp.float32)
    logvar = jnp.log1p(-ab_T)
    kl = gaussian_kl(mean, logvar, jnp.zeros_like(mean), 0.0)
    return _mean_flat(kl)


def vlb_term(
    sched: DiffusionSchedule,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """One bound term at timestep ``t`` (per-sample, (B,), nats/dim):
    the posterior KL for t > 0, the discretized decoder NLL at t == 0
    (where the p-mean collapses to x0_hat — posterior coefs at index 0 are
    (1, 0)).  ``x_t`` must be a draw from q(x_t | x0) at this ``t``.
    """
    eps_pred = eps_fn(x_t, t)
    x0_hat = predict_x0(sched, x_t, eps_pred, t)
    if sched.clamp_x0:  # p_sample_step's (redundant) second clamp — parity
        x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
    mean_p, _vp, logvar_p = posterior_mean_variance(sched, x_t, x0_hat, t)
    mean_q, _vq, logvar_q = posterior_mean_variance(sched, x_t, x0, t)
    kl = _mean_flat(gaussian_kl(mean_q, logvar_q, mean_p, logvar_p))

    # decoder variance: posterior_variance[0] is clipped to 1e-20 in the
    # schedule (degenerate); use index 1, the standard convention
    log_scale_dec = 0.5 * jnp.log(sched.posterior_variance[1])
    dec_nll = -_mean_flat(
        discretized_gaussian_log_likelihood(x0, mean_p, log_scale_dec))
    return jnp.where(t == 0, dec_nll, kl)


def vlb_bits_per_dim(
    sched: DiffusionSchedule,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    key: jax.Array,
    return_terms: bool = False,
) -> jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray]:
    """The FULL bound: all T terms + the prior term, per sample, bits/dim.

    One ``lax.scan`` over t = 0..T-1; each term draws its own x_t ~
    q(x_t|x0) (key ``fold_in`` t), one model eval per term — T evals per
    image, i.e. the cost of one full ancestral sampling pass.  Returns (B,)
    bits/dim; with ``return_terms`` also the (T, B) per-term nats/dim table
    (prior term NOT included) for diagnostics like a per-t bound profile.
    """
    B = x0.shape[0]

    def body(total, t_scalar):
        tb = jnp.full((B,), t_scalar, jnp.int32)
        eps = jax.random.normal(
            jax.random.fold_in(key, t_scalar), x0.shape, jnp.float32)
        x_t = q_sample(sched, x0.astype(jnp.float32), tb, eps)
        term = vlb_term(sched, eps_fn, x0, x_t, tb)
        return total + term, (term if return_terms else jnp.zeros(()))

    total, terms = jax.lax.scan(
        body, jnp.zeros((B,), jnp.float32), jnp.arange(sched.T))
    bpd = (total + prior_kl(sched, x0)) / _LN2
    if return_terms:
        return bpd, terms
    return bpd


def vlb_bits_per_dim_mc(
    sched: DiffusionSchedule,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    key: jax.Array,
    num_t: int = 50,
) -> jnp.ndarray:
    """Unbiased Monte-Carlo estimate of :func:`vlb_bits_per_dim` from
    ``num_t`` uniform timestep draws per image instead of all T:
    ``T * E_{t~U{0..T-1}}[term_t] + L_T``, per sample, bits/dim.

    ~T/num_t cheaper; variance shrinks as 1/num_t.  Exact (== the full
    bound) as num_t -> inf in expectation; use the full version for
    publishable numbers and this for in-training monitoring.
    """
    B = x0.shape[0]
    kt, kn = jax.random.split(key)
    ts = jax.random.randint(kt, (num_t, B), 0, sched.T, dtype=jnp.int32)

    def body(total, inp):
        i, tb = inp
        eps = jax.random.normal(
            jax.random.fold_in(kn, i), x0.shape, jnp.float32)
        x_t = q_sample(sched, x0.astype(jnp.float32), tb, eps)
        return total + vlb_term(sched, eps_fn, x0, x_t, tb), None

    total, _ = jax.lax.scan(
        body, jnp.zeros((B,), jnp.float32),
        (jnp.arange(num_t), ts))
    nats = total / num_t * sched.T + prior_kl(sched, x0)
    return nats / _LN2
