"""Reverse-process sampling loops as single compiled ``lax.scan`` programs.

This is the biggest structural win over the reference: its Python ``for``
loops over T=1000 steps (``ddpm_inference.py:36-38``,
``ddpim_inference.py:74-87``) dispatch one kernel launch batch per step; here
the entire trajectory is ONE jitted program — the scan carries x (buffer
donated by jit), per-step noise comes from ``jax.random.fold_in`` of a single
base key, and denoise-strip snapshots are scattered into a preallocated
(K, H, W, C) frame buffer inside the same scan (SURVEY.md §7 "hard parts").

``eps_fn(x_t, t) -> eps_hat`` is a closure over model params; callers wrap
these loops (or functions composed of them) in ``jax.jit``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.diffusion import EpsFn, ddim_step, p_sample_step
from ..ops.schedules import DiffusionSchedule
from .timesteps import build_ddim_schedule, ddpm_timesteps

__all__ = [
    "ddpm_sample_loop",
    "ddim_sample_loop",
    "to_unit_interval",
]


def to_unit_interval(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1] with clipping, the reference's post-sampling rescale
    (``ddpm_inference.py:40``)."""
    return (jnp.clip(x, -1.0, 1.0) + 1.0) * 0.5


def _capture_slots(ts: np.ndarray, capture_steps: Optional[Sequence[int]]) -> Tuple[np.ndarray, int]:
    """Map each scan step to a frame slot (-1 = no capture).

    Frames are ordered by trajectory position (high t first), matching the
    reference's strip layout (``ddpm_inference.py:103-110``).
    """
    if capture_steps is None:
        return np.full(ts.shape, -1, dtype=np.int32), 0
    ladder = set(ts.tolist())
    req = sorted({int(t) for t in capture_steps}, reverse=True)
    cap = [t for t in req if t in ladder]
    if not cap:
        # fail here with names, not later as `np.asarray(None).shape[0]`
        raise ValueError(
            f"capture_steps {req} has no overlap with the sampler's "
            f"timestep ladder ({len(ladder)} steps, "
            f"{max(ladder)}..{min(ladder)}); pick values from the ladder "
            "or pass capture_steps=None for the default spread")
    slot_of = {t: i for i, t in enumerate(cap)}
    slots = np.array([slot_of.get(int(t), -1) for t in ts], dtype=np.int32)
    return slots, len(cap)


def ddpm_sample_loop(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    x_init: jnp.ndarray,
    key: jax.Array,
    *,
    num_steps: Optional[int] = None,
    clip_x0: Optional[bool] = None,
    capture_steps: Optional[Sequence[int]] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Full ancestral reverse loop x_T -> x_0 (T scan iterations).

    Returns ``(x_0, frames)``; ``frames`` is a (K, H, W, C) [0,1] buffer of
    snapshots at ``capture_steps`` (None if not requested).  ``num_steps``
    truncates the ladder like ``training_utils.py:13`` (steps arg).
    """
    T = sched.T if num_steps is None else int(num_steps)
    ts = ddpm_timesteps(T)
    slots, n_frames = _capture_slots(ts, capture_steps)

    B = x_init.shape[0]
    frames0 = (
        jnp.zeros((n_frames, *x_init.shape[1:]), dtype=jnp.float32)
        if n_frames
        else None
    )

    def body(carry, step):
        x, frames = carry
        t_scalar, slot = step
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(key, t_scalar), x.shape, dtype=x.dtype)
        x = p_sample_step(sched, eps_fn, x, t, noise, clip_x0=clip_x0)
        if frames is not None:
            safe = jnp.maximum(slot, 0)
            snap = to_unit_interval(x[0]).astype(jnp.float32)
            frames = frames.at[safe].set(jnp.where(slot >= 0, snap, frames[safe]))
        return (x, frames), None

    (x, frames), _ = jax.lax.scan(
        body, (x_init, frames0), (jnp.asarray(ts), jnp.asarray(slots))
    )
    return x, frames


def ddim_sample_loop(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    x_init: jnp.ndarray,
    key: jax.Array,
    *,
    timesteps: Optional[np.ndarray] = None,
    schedule_kind: str = "t_linear",
    steps: int = 50,
    eta: float = 0.0,
    clip_x0: Optional[bool] = None,
    capture_steps: Optional[Sequence[int]] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """DDIM reverse loop over a sub-sampled ladder (one scan, ~steps iters).

    ``timesteps`` (descending, ending at 0) overrides the built-in schedule
    kinds.  Capture semantics match the reference strip: a frame is recorded
    *after* the step whose current index t is in ``capture_steps``
    (``ddpim_inference.py:182-184``) — including the final 0->0 "step" the
    reference performs because its ladder always appends 0.
    """
    if timesteps is None:
        timesteps = build_ddim_schedule(
            schedule_kind, steps, sched.T,
            alphas_cumprod=np.asarray(sched.alphas_cumprod),
        )
    ts = np.asarray(timesteps, dtype=np.int32)
    # pair i -> (t_cur = ts[i], t_prev = ts[i+1]); reference's strip also
    # steps the last entry with t_prev=0 (ddpim_inference.py:168-171)
    t_cur = ts
    t_prev = np.concatenate([ts[1:], np.zeros((1,), np.int32)])
    slots, n_frames = _capture_slots(t_cur, capture_steps)

    B = x_init.shape[0]
    frames0 = (
        jnp.zeros((n_frames, *x_init.shape[1:]), dtype=jnp.float32)
        if n_frames
        else None
    )

    def body(carry, step):
        x, frames = carry
        tc, tp, slot = step
        t = jnp.full((B,), tc, dtype=jnp.int32)
        tprev = jnp.full((B,), tp, dtype=jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(key, tc), x.shape, dtype=x.dtype)
        x = ddim_step(sched, eps_fn, x, t, tprev, noise, eta=eta, clip_x0=clip_x0)
        if frames is not None:
            safe = jnp.maximum(slot, 0)
            snap = to_unit_interval(x[0]).astype(jnp.float32)
            frames = frames.at[safe].set(jnp.where(slot >= 0, snap, frames[safe]))
        return (x, frames), None

    # when no strip capture, the final 0->0 step is the identity-ish closing
    # step the reference's grid sampler does NOT take (it iterates pairs only,
    # training_utils.py:88-92) — so skip it unless capturing.
    n_iter = len(ts) if n_frames else len(ts) - 1
    xs = (
        jnp.asarray(t_cur[:n_iter]),
        jnp.asarray(t_prev[:n_iter]),
        jnp.asarray(slots[:n_iter]),
    )
    (x, frames), _ = jax.lax.scan(body, (x_init, frames0), xs)
    return x, frames
