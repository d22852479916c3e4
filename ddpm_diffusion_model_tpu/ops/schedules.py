"""Diffusion noise schedules and the precomputed schedule table pytree.

TPU-native redesign of the reference's schedule machinery
(``src/model/difussion_utils.py:7-40`` and the buffer registration block in
``src/model/difussion_class.py:35-68``): instead of ``nn.Module`` buffers that
ride along with ``.to(device)``, all derived tables live in one frozen
``flax.struct`` pytree built eagerly with NumPy at trace time.  The tables are
closed over by jitted programs (samplers, train step), so XLA constant-folds
the gathers and fuses the broadcasts — there is no runtime "move buffers"
step, and (matching ``difussion_class.py:46-48``) the tables are *not* part of
checkpoints: they are always rebuilt from ``DiffusionConfig``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "DiffusionConfig",
    "DiffusionSchedule",
    "beta_schedule_linear",
    "beta_schedule_cosine",
    "beta_schedule_rf",
    "make_schedule",
    "extract",
]


def beta_schedule_linear(T: int, beta_min: float = 1e-4, beta_max: float = 2e-2) -> np.ndarray:
    """Classic linear beta schedule in [beta_min, beta_max].

    Parity: ``src/model/difussion_utils.py:16-20``.
    """
    return np.linspace(beta_min, beta_max, T, dtype=np.float32)


def _alpha_bar_cosine(t: np.ndarray, s: float = 0.008) -> np.ndarray:
    """Continuous cosine alpha-bar (Nichol & Dhariwal), t in [0, 1].

    Parity: ``src/model/difussion_utils.py:22-29`` (cos clamped to >=1e-7
    *before* squaring, exactly as the reference does).
    """
    x = (t + s) / (1.0 + s)
    c = np.clip(np.cos((math.pi / 2.0) * x), 1e-7, None)
    return (c**2).astype(np.float32)


def beta_schedule_cosine(T: int, s: float = 0.008) -> np.ndarray:
    """Discretized cosine schedule: betas from alpha-bar differences.

    Parity: ``src/model/difussion_utils.py:32-40`` (normalize so
    alpha_bar(0)=1; betas clipped to [1e-8, 0.999]).
    """
    steps = np.arange(T + 1, dtype=np.float32) / T
    ab = _alpha_bar_cosine(steps, s=s)
    ab = ab / ab[0]
    betas = 1.0 - (ab[1:] / ab[:-1])
    return np.clip(betas, 1e-8, 0.999).astype(np.float32)


def beta_schedule_rf(T: int) -> np.ndarray:
    """Rectified-flow / flow-matching schedule, expressed as betas.

    The linear interpolant x_s = (1-s) x0 + s eps (Liu et al. 2023; the
    SD3/Flux family) is a variance-preserving diffusion after dividing by
    c_s = sqrt((1-s)^2 + s^2):

        alpha_bar(s) = (1-s)^2 / ((1-s)^2 + s^2),   SNR(s) = ((1-s)/s)^2

    so the ENTIRE stack — q_sample, every sampler, CFG, weightings, the
    likelihood bound — runs flow matching unchanged through the standard
    tables.  Discretized at s_t = (t+1)/(T+1), t = 0..T-1 (s=0 would make
    alpha_bar exactly 1 and degenerate the t=0 conversions, same reason the
    linear schedule starts at beta_min > 0).  The reference has no flow
    path at all; pair with ``prediction_type="flow"`` for the canonical
    velocity target u = eps - x0.
    """
    s = (np.arange(T, dtype=np.float64) + 1.0) / (T + 1.0)
    ab = (1.0 - s) ** 2 / ((1.0 - s) ** 2 + s**2)
    ab_prev = np.concatenate([np.ones((1,)), ab[:-1]])
    betas = 1.0 - ab / ab_prev
    return np.clip(betas, 1e-8, 0.999).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static diffusion hyperparameters (the ctor args of the reference's
    ``Diffusion`` module, ``difussion_class.py:19-27``).

    Checkpoints persist this config, never the derived tables.
    """

    T: int = 1000
    schedule: str = "linear"  # "linear" | "cosine" | "rf"
    beta_min: float = 1e-4
    beta_max: float = 2e-2
    cosine_s: float = 0.008
    clamp_x0: bool = True
    dynamic_threshold: Optional[float] = None
    img_size: Optional[int] = None
    # what the network OUTPUT means (the reference is epsilon-only):
    #   "epsilon" — predict the noise (DDPM, Ho et al. 2020)
    #   "v"       — predict v = sqrt(ab) eps - sqrt(1-ab) x0
    #               (Salimans & Ho 2022, progressive distillation)
    #   "x0"      — predict the clean image directly
    #   "flow"    — predict the flow-matching velocity u = eps - x0
    #               (rectified flow, Liu et al. 2023; pair with
    #               schedule="rf" for the linear-interpolant marginals)
    # Training targets the native space; samplers convert back to eps at
    # the eps_fn boundary (ops/diffusion.py model_output_to_eps), so every
    # sampler works unchanged under any parameterization.
    prediction_type: str = "epsilon"

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "DiffusionConfig":
        return cls(**d)


@struct.dataclass
class DiffusionSchedule:
    """Frozen pytree of all precomputed per-timestep tables.

    Mirrors every buffer registered in ``difussion_class.py:46-68``; all
    float32, shape (T,).  Static metadata travels as non-pytree fields so the
    same jitted program is reused across schedules of equal length.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    # static (hashable) metadata — not traced
    T: int = struct.field(pytree_node=False, default=1000)
    clamp_x0: bool = struct.field(pytree_node=False, default=True)
    dynamic_threshold: Optional[float] = struct.field(pytree_node=False, default=None)
    img_size: Optional[int] = struct.field(pytree_node=False, default=None)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")


def make_schedule(config: DiffusionConfig) -> DiffusionSchedule:
    """Build all derived tables from the config.

    Derivations match ``difussion_class.py:35-68``:
      alphas        = 1 - betas
      alpha_bar     = cumprod(alphas)
      alpha_bar_prev= [1.0, alpha_bar[:-1]]
      post_var      = betas * (1 - ab_prev) / (1 - ab), clipped >= 1e-20
      coef1         = betas * sqrt(ab_prev) / (1 - ab)
      coef2         = (1 - ab_prev) * sqrt(alphas) / (1 - ab)
    """
    if config.schedule == "linear":
        betas = beta_schedule_linear(config.T, config.beta_min, config.beta_max)
    elif config.schedule == "cosine":
        betas = beta_schedule_cosine(config.T, s=config.cosine_s)
    elif config.schedule == "rf":
        betas = beta_schedule_rf(config.T)
    else:
        raise ValueError(f"unknown schedule: {config.schedule!r}")
    if config.prediction_type not in ("epsilon", "v", "x0", "flow"):
        raise ValueError("prediction_type must be 'epsilon'|'v'|'x0'|'flow', "
                         f"got {config.prediction_type!r}")

    betas = betas.astype(np.float32)
    alphas = 1.0 - betas
    ab = np.cumprod(alphas, axis=0)
    ab_prev = np.concatenate([np.ones((1,), dtype=np.float32), ab[:-1]])
    post_var = betas * (1.0 - ab_prev) / (1.0 - ab)
    post_var_clipped = np.clip(post_var, 1e-20, None)

    as_j = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=as_j(betas),
        alphas=as_j(alphas),
        alphas_cumprod=as_j(ab),
        sqrt_alphas_cumprod=as_j(np.sqrt(ab)),
        sqrt_one_minus_alphas_cumprod=as_j(np.sqrt(1.0 - ab)),
        alphas_cumprod_prev=as_j(ab_prev),
        posterior_variance=as_j(post_var_clipped),
        posterior_log_variance=as_j(np.log(post_var_clipped)),
        posterior_mean_coef1=as_j(betas * np.sqrt(ab_prev) / (1.0 - ab)),
        posterior_mean_coef2=as_j((1.0 - ab_prev) * np.sqrt(alphas) / (1.0 - ab)),
        T=int(config.T),
        clamp_x0=bool(config.clamp_x0),
        dynamic_threshold=config.dynamic_threshold,
        img_size=config.img_size,
        prediction_type=config.prediction_type,
    )


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample scalars from a (T,) table and reshape for broadcast.

    ``extract(table, t, x.ndim)`` returns shape (B, 1, ..., 1) with ``ndim``
    dims total.  Indices are clamped to [0, T-1] like the reference
    (``difussion_utils.py:7-14``).  Under jit this lowers to a fused
    gather+reshape — no host round trip.
    """
    t = jnp.clip(t.astype(jnp.int32), 0, table.shape[0] - 1)
    out = jnp.take(table, t, axis=0)
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))
