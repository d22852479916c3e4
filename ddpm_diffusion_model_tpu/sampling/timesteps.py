"""DDIM timestep index schedules (host-side, static).

The reference builds its sub-sampled timestep ladders in torch on device at
every call (``training_utils.py:73-86`` and ``ddpim_inference.py:40-72``).
They are tiny, static, and feed a compiled scan — so here they are plain
NumPy computed once; the resulting array becomes a compile-time constant of
the jitted sampler.

Supported kinds (descending indices, always ending at 0):

- ``"t_linear"``    equal spacing in t              (``ddpim_inference.py:47-53``)
- ``"linear"``      equal spacing, steps+1 points   (``training_utils.py:73-74``)
- ``"cosine"``      w = 0.5*(1-cos(pi*s)) warp, steps+1 points
                    (``training_utils.py:75-78``)
- ``"t_cosine"``    same warp with ``steps`` points — the strip renderer's
                    "cosine" variant (``ddpim_inference.py:148-151``)
- ``"karras"``      power-2 warp idx=(T-1)*(1-s^2)  (``training_utils.py:79-82``)
- ``"alpha_bar_cosine"``  match alpha-bar targets 1-u by nearest index
                    (``ddpim_inference.py:55-67``; needs ``alphas_cumprod``)
- explicit list via ``explicit=[...]``              (``ddpim_inference.py:41-45``)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["build_ddim_schedule", "ddpm_timesteps"]


def ddpm_timesteps(T: int) -> np.ndarray:
    """Full ancestral ladder T-1 .. 0."""
    return np.arange(T - 1, -1, -1, dtype=np.int32)


def _dedupe_descending(idx: np.ndarray) -> np.ndarray:
    out = np.unique(idx.astype(np.int64))[::-1]
    return out


def build_ddim_schedule(
    kind: str = "t_linear",
    steps: int = 50,
    T: int = 1000,
    *,
    alphas_cumprod: Optional[np.ndarray] = None,
    explicit: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Return a strictly-descending int32 index ladder whose last entry is 0."""
    if explicit is not None:
        idx = np.array(sorted({int(t) for t in explicit}, reverse=True), dtype=np.int64)
    elif kind == "t_linear":
        idx = np.round(np.linspace(T - 1, 0, steps)).astype(np.int64)
        idx = _dedupe_descending(idx)
    elif kind == "linear":
        idx = np.round(np.linspace(T - 1, 0, steps + 1)).astype(np.int64)
        idx = _dedupe_descending(idx)
    elif kind in ("cosine", "t_cosine"):
        npts = steps + 1 if kind == "cosine" else steps
        s = np.linspace(0.0, 1.0, npts)
        w = 0.5 * (1.0 - np.cos(np.pi * s))
        idx = np.round((T - 1) * (1.0 - w)).astype(np.int64)
        idx = _dedupe_descending(idx)
    elif kind == "karras":
        s = np.linspace(0.0, 1.0, steps + 1) ** 2.0
        idx = np.round((T - 1) * (1.0 - s)).astype(np.int64)
        idx = _dedupe_descending(idx)
    elif kind == "alpha_bar_cosine":
        if alphas_cumprod is None:
            raise ValueError("alpha_bar_cosine schedule needs alphas_cumprod")
        ab = np.asarray(alphas_cumprod)
        targets = 1.0 - np.linspace(0.0, 1.0, steps)
        picked = {int(np.abs(ab - z).argmin()) for z in targets}
        idx = np.array(sorted(picked, reverse=True), dtype=np.int64)
    else:
        raise ValueError(f"unknown ddim schedule kind: {kind!r}")

    idx = np.clip(idx, 0, T - 1)
    if idx.size == 0 or idx[-1] != 0:
        idx = np.concatenate([idx, np.zeros((1,), dtype=np.int64)])
    return idx.astype(np.int32)
