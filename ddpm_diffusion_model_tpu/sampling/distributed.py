"""Mesh-sharded (data-parallel) sampling: one SPMD scan over all chips.

The reference can only sample on its single GPU (``ddpm_inference.py:6-59``
iterates one device's batch).  Here the whole reverse trajectory is already
ONE compiled ``lax.scan`` (loops.py); sharding the batch over a mesh axis
makes that same program SPMD — every chip denoises its slice of the grid,
with zero per-step communication (the reverse process is embarrassingly
parallel over samples; GroupNorm statistics are per-sample).  A v5e-8 slice
therefore samples grids 8x faster with no code change to the loops.

Usage::

    mesh = make_mesh()                      # ('data',) over all devices
    x01 = sample_grid_sharded(model, params, sched, mesh, kind="ddim",
                              n=64, img_size=64, steps=50)

``params`` may live anywhere; they are replicated onto the mesh.  ``n``
must divide by the mesh's data-axis size (the natural grid sizes 16/36/64
all divide typical slices; a clear error is raised otherwise).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.schedules import DiffusionSchedule
from .loops import ddim_sample_loop, ddpm_sample_loop, to_unit_interval
from .solvers import dpmpp2m_sample_loop, dpmpp2m_sde_sample_loop
from .timesteps import build_ddim_schedule

__all__ = ["sample_grid_sharded"]


@functools.partial(
    jax.jit,
    static_argnames=("model", "shape", "kind", "num_steps", "timesteps",
                     "eta", "mesh", "axis", "guidance"),
)
def _sharded_sample_jit(model, params, sched, key, shape, kind, num_steps,
                        timesteps, eta, mesh, axis, y=None, guidance=1.0):
    from .inference import cfg_eps_fn

    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, shape, dtype=jnp.float32)
    batch_sh = NamedSharding(mesh, P(axis))
    x = jax.lax.with_sharding_constraint(x, batch_sh)
    if y is not None:
        # labels shard with their samples; the CFG-doubled concat keeps the
        # batch axis sharded (GSPMD propagates through concat)
        y = jax.lax.with_sharding_constraint(
            jnp.asarray(y, jnp.int32), NamedSharding(mesh, P(axis)))
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    if kind == "ddpm":
        out, _ = ddpm_sample_loop(sched, eps_fn, x, k_loop,
                                  num_steps=num_steps)
    elif kind == "dpmpp":
        out = dpmpp2m_sample_loop(
            sched, eps_fn, x,
            timesteps=np.asarray(timesteps, dtype=np.int32), clip_x0=True,
        )
    elif kind == "dpmpp_sde":
        # per-step noise is drawn over the GLOBAL batch shape under the same
        # sharding constraint as x, so it shards like the samples do
        out = dpmpp2m_sde_sample_loop(
            sched, eps_fn, x, k_loop,
            timesteps=np.asarray(timesteps, dtype=np.int32), clip_x0=True,
        )
    else:
        out, _ = ddim_sample_loop(
            sched, eps_fn, x, k_loop,
            timesteps=np.asarray(timesteps, dtype=np.int32),
            eta=eta, clip_x0=True,
        )
    return jax.lax.with_sharding_constraint(out, batch_sh)


def sample_grid_sharded(
    model,
    params,
    sched: DiffusionSchedule,
    mesh: Mesh,
    *,
    kind: str = "ddim",
    n: int = 64,
    img_size: int = 64,
    axis: str = "data",
    seed: int = 1234,
    steps: Optional[int] = None,
    num_steps: Optional[int] = None,
    eta: float = 0.0,
    schedule_kind: str = "t_linear",
    ema_params=None,
    save_path: Optional[str] = None,
    class_id=None,
    guidance: float = 1.0,
) -> np.ndarray:
    """Sample an ``n``-image grid with the batch sharded over ``mesh[axis]``.

    Returns the gathered (n, H, W, C) [0,1] array on the host.  ``kind`` is
    ``"ddpm"`` (ancestral, ``num_steps`` truncation like the reference's
    ``training_utils.py:13``), ``"ddim"`` (ladder of ``steps``, default 50)
    or ``"dpmpp"`` / ``"dpmpp_sde"`` (DPM-Solver++(2M) ODE / SDE variants,
    ladder of ``steps``, default 20).
    Passing ``steps`` with ``kind="ddpm"`` raises — the ancestral knob is
    ``num_steps``, and silently running the full T-step chain instead of
    the requested 50 would cost ~20x wall-clock.

    ``class_id``/``guidance``: classifier-free guidance on conditional
    models (see :func:`~.inference.cfg_eps_fn`); CFG is per-sample, so it
    shards exactly like the unconditional loop (zero extra collectives).
    """
    if kind not in ("ddpm", "ddim", "dpmpp", "dpmpp_sde"):
        raise ValueError(
            f"kind must be 'ddpm'|'ddim'|'dpmpp'|'dpmpp_sde', got {kind!r}")
    if kind == "ddpm" and steps is not None:
        raise ValueError(
            "steps= sets the DDIM ladder only; for kind='ddpm' use "
            "num_steps= (ancestral truncation)")
    if steps is None:
        steps = {"ddim": 50, "dpmpp": 20, "dpmpp_sde": 20}.get(kind)
    n_dev = mesh.shape[axis]
    if n % n_dev:
        raise ValueError(
            f"n={n} must be divisible by the '{axis}' mesh axis ({n_dev})")

    from ..parallel.sharding import put_global

    p = ema_params if ema_params is not None else params
    p = put_global(p, mesh)      # replicate (multi-process safe)
    sched_dev = put_global(sched, mesh)

    ts = None
    if kind in ("ddim", "dpmpp", "dpmpp_sde"):
        ts = tuple(
            int(t) for t in build_ddim_schedule(
                schedule_kind, steps, sched.T,
                alphas_cumprod=np.asarray(sched.alphas_cumprod),
            )
        )

    from .inference import _label_vector

    shape = (n, img_size, img_size, model.config.in_channels)
    x = _sharded_sample_jit(
        model, p, sched_dev, jax.random.key(seed), shape, kind,
        num_steps, ts, float(eta), mesh, axis,
        y=_label_vector(class_id, n), guidance=float(guidance),
    )
    x = to_unit_interval(x)
    if jax.process_count() > 1:
        # multi-host: each process only holds its shard — allgather so every
        # host returns the full grid (scripts/multihost_sim.py exercises this)
        from jax.experimental import multihost_utils

        x01 = np.asarray(multihost_utils.process_allgather(x, tiled=True))
    else:
        x01 = np.asarray(jax.device_get(x))
    if save_path and jax.process_index() == 0:
        from ..utils.images import save_image_grid

        save_image_grid(x01, save_path, nrow=int(n**0.5))
    return x01
