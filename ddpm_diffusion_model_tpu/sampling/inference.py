"""User-facing inference API: sample grids, per-image saves, denoise strips.

Capability parity with the reference's ``src/testing/ddpm_inference.py`` and
``src/testing/ddpim_inference.py`` plus the in-training samplers
(``training_utils.py:7-29,54-100``) — redesigned for JAX:

- the reference's EMA weight-swap dance (state-dict backup -> ``ema.copy_to``
  -> sample -> restore, ``ddpm_inference.py:26-28,54-56``) dissolves: params
  are just a pytree argument, so pass ``ema_params`` to sample with EMA.
- eval/train mode juggling disappears (samplers always run the model
  deterministically).
- the T-step Python loops are single compiled scans (see ``loops.py``); the
  jit cache is keyed on (model, ladder, capture set), so repeated calls
  with new params/seeds reuse the compiled program.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import UNetDenoiser
from ..ops.schedules import DiffusionSchedule
from ..utils.images import make_grid, save_image, save_image_grid
from .loops import ddim_sample_loop, ddpm_sample_loop, to_unit_interval
from .solvers import dpmpp2m_sample_loop, dpmpp2m_sde_sample_loop
from .timesteps import build_ddim_schedule

__all__ = [
    "cfg_eps_fn",
    "ddpm_sample",
    "ddim_sample",
    "ddpm_infer_sample",
    "ddim_infer_sample",
    "dpmpp_infer_sample",
    "render_denoise_strip",
    "render_denoise_strip_ddim",
]


def cfg_eps_fn(model, params, y=None, guidance: float = 1.0, sched=None,
               x_cond=None):
    """Build the ``eps_fn(x_t, t)`` closure every sampler consumes, with
    optional class conditioning + classifier-free guidance.

    - ``y=None``: the plain (un)conditional forward (conditional models use
      their NULL token internally — see the model families).
    - ``y`` given, ``guidance == 1``: one conditional forward.
    - ``y`` given, ``guidance != 1``: CFG (Ho & Salimans 2022) —
      ``eps = eps_u + w * (eps_c - eps_u)`` with the conditional and NULL
      branches batched into ONE doubled forward (one MXU pass, no second
      dispatch); ``w=0`` is unconditional, ``w>1`` amplifies the class.

    ``sched``: when given and ``sched.prediction_type != "epsilon"``, the
    network's native output (v / x0) is converted to eps AFTER the CFG
    combine (the conversion is affine in the output at fixed (x_t, t), so
    combine-then-convert equals convert-then-combine exactly, for one
    conversion instead of two).

    ``x_cond``: image conditioning for SR-upsampler models
    (``cond_channels > 0``, ops/superres.py) — threaded into every forward
    (doubled alongside x for the CFG branch).
    """
    convert = (sched is not None
               and sched.prediction_type != "epsilon")
    c_kw = {} if x_cond is None else {"x_cond": x_cond}

    def _to_eps(out, xt, t):
        if not convert:
            return out
        from ..ops.diffusion import model_output_to_eps

        return model_output_to_eps(sched, out, xt, t)

    if y is None:
        return lambda xt, t: _to_eps(model.apply(params, xt, t, **c_kw),
                                     xt, t)
    num_classes = int(getattr(model.config, "num_classes", 0))
    if not num_classes:
        raise ValueError("class-conditional sampling needs a conditional "
                         "model (num_classes > 0)")
    y = jnp.asarray(y, jnp.int32)
    if float(guidance) == 1.0:
        return lambda xt, t: _to_eps(
            model.apply(params, xt, t, y=y, **c_kw), xt, t)

    cc_kw = ({} if x_cond is None
             else {"x_cond": jnp.concatenate([x_cond, x_cond])})

    def eps_fn(xt, t):
        xx = jnp.concatenate([xt, xt])
        tt = jnp.concatenate([t, t])
        yy = jnp.concatenate([y, jnp.full_like(y, num_classes)])
        eps = model.apply(params, xx, tt, y=yy, **cc_kw)
        e_c, e_u = jnp.split(eps, 2)
        w = jnp.asarray(guidance, jnp.float32)
        out = e_u.astype(jnp.float32) + w * (
            e_c.astype(jnp.float32) - e_u.astype(jnp.float32))
        return _to_eps(out.astype(xt.dtype), xt, t)

    return eps_fn


def _label_vector(class_id, n: int):
    """CLI-friendly label arg: None | int (whole grid) | per-sample array."""
    if class_id is None:
        return None
    arr = np.asarray(class_id, dtype=np.int32)
    if arr.ndim == 0:
        return jnp.full((n,), int(arr), jnp.int32)
    if arr.shape != (n,):
        raise ValueError(f"class_id must be a scalar or shape ({n},), "
                         f"got {arr.shape}")
    return jnp.asarray(arr)


@functools.partial(
    jax.jit,
    static_argnames=("model", "shape", "num_steps", "capture_steps",
                     "guidance"),
)
def _ddpm_jit(model, params, sched, key, shape, num_steps, capture_steps,
              y=None, guidance=1.0):
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, shape, dtype=jnp.float32)
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    return ddpm_sample_loop(
        sched, eps_fn, x, k_loop, num_steps=num_steps, capture_steps=capture_steps
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "shape", "timesteps", "capture_steps",
                     "guidance"),
)
def _ddim_jit(model, params, sched, key, shape, timesteps, eta, capture_steps,
              y=None, guidance=1.0):
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, shape, dtype=jnp.float32)
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    return ddim_sample_loop(
        sched, eps_fn, x, k_loop,
        timesteps=np.asarray(timesteps, dtype=np.int32),
        eta=eta, clip_x0=True, capture_steps=capture_steps,
    )


@functools.partial(
    jax.jit, static_argnames=("model", "shape", "timesteps", "guidance",
                              "sde")
)
def _dpmpp_jit(model, params, sched, key, shape, timesteps, y=None,
               guidance=1.0, sde=False):
    # ODE variant is deterministic, but split like _ddim_jit so the same
    # seed draws the same init noise across samplers (cross-sampler
    # comparisons); the SDE variant spends the loop key on per-step noise.
    k_init, k_loop = jax.random.split(key)
    x = jax.random.normal(k_init, shape, dtype=jnp.float32)
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    if sde:
        return dpmpp2m_sde_sample_loop(
            sched, eps_fn, x, k_loop,
            timesteps=np.asarray(timesteps, dtype=np.int32), clip_x0=True,
        )
    return dpmpp2m_sample_loop(
        sched, eps_fn, x,
        timesteps=np.asarray(timesteps, dtype=np.int32), clip_x0=True,
    )


@functools.partial(
    jax.jit, static_argnames=("model", "timesteps", "guidance")
)
def _dpmpp_from_init_jit(model, params, sched, x_init, timesteps, y=None,
                         guidance=1.0):
    """DPM-Solver++(2M) scan from EXPLICIT init noise — the serving
    coalescer's solver kernel (deterministic, like DDIM eta=0).
    ``y``/``guidance``: per-sample CFG (labels concatenate like the init
    noise; row i depends only on (x_i, y_i), so coalescing stays
    per-request deterministic)."""
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    return dpmpp2m_sample_loop(
        sched, eps_fn, x_init,
        timesteps=np.asarray(timesteps, dtype=np.int32), clip_x0=True,
    )


@functools.partial(
    jax.jit, static_argnames=("model", "timesteps", "guidance")
)
def _ddim_from_init_jit(model, params, sched, x_init, timesteps, y=None,
                        guidance=1.0):
    """Deterministic (eta=0) DDIM scan from EXPLICIT init noise — the
    kernel behind the serving coalescer, which concatenates per-request
    init noise into one batch.  Same loop/clip semantics as ``_ddim_jit``;
    ``y``/``guidance`` as in :func:`_dpmpp_from_init_jit`."""
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    out, _ = ddim_sample_loop(
        sched, eps_fn, x_init, jax.random.key(0),
        timesteps=np.asarray(timesteps, dtype=np.int32),
        eta=0.0, clip_x0=True,
    )
    return out


def ddpm_sample(
    model: UNetDenoiser,
    params,
    sched: DiffusionSchedule,
    n: int,
    img_size: int = 64,
    *,
    steps: Optional[int] = None,
    seed: int = 1234,
    save_path: Optional[str] = None,
    return_grid: bool = True,
    class_id=None,
    guidance: float = 1.0,
):
    """In-training DDPM grid sampler (parity: ``training_utils.py:7-29``).
    ``class_id``/``guidance``: CFG on conditional models."""
    key = jax.random.key(seed)
    x, _ = _ddpm_jit(
        model, params, sched, key,
        (n, img_size, img_size, model.config.in_channels), steps, None,
        y=_label_vector(class_id, n), guidance=float(guidance),
    )
    x01 = np.asarray(to_unit_interval(x))
    grid = make_grid(x01, nrow=int(n**0.5))
    if save_path is not None:
        save_image(grid, save_path)
    return grid if return_grid else x01


def ddim_sample(
    model: UNetDenoiser,
    params,
    sched: DiffusionSchedule,
    *,
    n: int = 16,
    img_size: int = 256,
    ema_params=None,
    save_path: Optional[str] = None,
    seed: int = 1234,
    steps: int = 50,
    eta: float = 0.0,
    schedule: str = "karras",  # "linear" | "cosine" | "karras" | "alpha_bar_cosine"
):
    """In-training DDIM sampler with the karras/cosine ladders
    (parity: ``training_utils.py:54-100``)."""
    p = ema_params if ema_params is not None else params
    ts = build_ddim_schedule(
        schedule, steps, sched.T, alphas_cumprod=np.asarray(sched.alphas_cumprod)
    )
    x, _ = _ddim_jit(
        model, p, sched, jax.random.key(seed),
        (n, img_size, img_size, model.config.in_channels),
        tuple(int(t) for t in ts), eta, None,
    )
    x01 = np.asarray(to_unit_interval(x))
    if save_path:
        save_image_grid(x01, save_path, nrow=int(n**0.5))
    return x01


def _save_outputs(x01: np.ndarray, out_path: str, save_individual: bool, out_dir: str):
    from ..utils.images import grid_nrow

    n = x01.shape[0]
    grid = make_grid(x01, nrow=grid_nrow(n))
    save_image(grid, out_path)
    if save_individual:
        os.makedirs(out_dir, exist_ok=True)
        for i in range(n):
            save_image(x01[i], os.path.join(out_dir, f"img_{i:03d}.png"))
    return grid


def ddpm_infer_sample(
    model: UNetDenoiser,
    params,
    sched: DiffusionSchedule,
    n: int = 36,
    img_size: int = 64,
    *,
    ema_params=None,
    out_path: str = "samples_ddpm.png",
    save_individual: bool = False,
    out_dir: str = "samples_individual",
    seed: Optional[int] = 1234,
    class_id=None,
    guidance: float = 1.0,
):
    """Full-T ancestral grid inference (parity: ``ddpm_inference.py:6-58``).
    ``class_id`` (int or per-sample array) + ``guidance`` enable CFG
    sampling on conditional models (see :func:`cfg_eps_fn`)."""
    p = ema_params if ema_params is not None else params
    key = jax.random.key(0 if seed is None else seed)
    x, _ = _ddpm_jit(
        model, p, sched, key,
        (n, img_size, img_size, model.config.in_channels), None, None,
        y=_label_vector(class_id, n), guidance=float(guidance),
    )
    x01 = np.asarray(to_unit_interval(x))
    return _save_outputs(x01, out_path, save_individual, out_dir)


def ddim_infer_sample(
    model: UNetDenoiser,
    params,
    sched: DiffusionSchedule,
    n: int = 36,
    img_size: int = 64,
    *,
    ema_params=None,
    out_path: str = "samples_ddim.png",
    save_individual: bool = False,
    out_dir: str = "samples_individual",
    seed: Optional[int] = 1234,
    steps: int = 50,
    eta: float = 0.0,
    schedule_kind: str = "t_linear",  # "t_linear" | "alpha_bar_cosine"
    schedule_idx: Optional[Sequence[int]] = None,
    class_id=None,
    guidance: float = 1.0,
):
    """Sub-sampled DDIM grid inference (parity: ``ddpim_inference.py:7-104``).
    ``class_id``/``guidance`` enable CFG on conditional models."""
    p = ema_params if ema_params is not None else params
    ts = build_ddim_schedule(
        schedule_kind, steps, sched.T,
        alphas_cumprod=np.asarray(sched.alphas_cumprod),
        explicit=schedule_idx,
    )
    x, _ = _ddim_jit(
        model, p, sched, jax.random.key(0 if seed is None else seed),
        (n, img_size, img_size, model.config.in_channels),
        tuple(int(t) for t in ts), eta, None,
        y=_label_vector(class_id, n), guidance=float(guidance),
    )
    x01 = np.asarray(to_unit_interval(x))
    return _save_outputs(x01, out_path, save_individual, out_dir)


def dpmpp_infer_sample(
    model: UNetDenoiser,
    params,
    sched: DiffusionSchedule,
    n: int = 36,
    img_size: int = 64,
    *,
    ema_params=None,
    out_path: str = "samples_dpmpp.png",
    save_individual: bool = False,
    out_dir: str = "samples_individual",
    seed: Optional[int] = 1234,
    steps: int = 20,
    schedule_kind: str = "t_linear",
    schedule_idx: Optional[Sequence[int]] = None,
    class_id=None,
    guidance: float = 1.0,
    sde: bool = False,
):
    """DPM-Solver++(2M) grid inference — the fast deterministic sampler
    (beyond the reference's DDPM/DDIM pair; see ``solvers.py``).  Same grid/
    save semantics as ``ddim_infer_sample``; ~20 steps matches DDIM-50.
    ``class_id``/``guidance`` enable CFG on conditional models.
    ``sde=True`` runs the stochastic SDE-DPM-Solver++(2M) variant (fresh
    noise each step, exact delta-data marginals; see ``solvers.py``)."""
    p = ema_params if ema_params is not None else params
    ts = build_ddim_schedule(
        schedule_kind, steps, sched.T,
        alphas_cumprod=np.asarray(sched.alphas_cumprod),
        explicit=schedule_idx,
    )
    x = _dpmpp_jit(
        model, p, sched, jax.random.key(0 if seed is None else seed),
        (n, img_size, img_size, model.config.in_channels),
        tuple(int(t) for t in ts),
        y=_label_vector(class_id, n), guidance=float(guidance),
        sde=bool(sde),
    )
    x01 = np.asarray(to_unit_interval(x))
    return _save_outputs(x01, out_path, save_individual, out_dir)


def render_denoise_strip(
    model: UNetDenoiser,
    params,
    sched: DiffusionSchedule,
    *,
    img_size: int = 64,
    ema_params=None,
    seed: Optional[int] = 1234,
    out_path: str = "denoise_strip.png",
    capture_steps: Optional[Sequence[int]] = None,
    pad: int = 2,
):
    """DDPM T->0 trajectory strip, ~20 snapshots by default
    (parity: ``ddpm_inference.py:62-119``)."""
    p = ema_params if ema_params is not None else params
    if capture_steps is None:
        capture_steps = [int(v) for v in np.round(np.linspace(sched.T - 1, 0, 20))]
    _, frames = _ddpm_jit(
        model, p, sched, jax.random.key(0 if seed is None else seed),
        (1, img_size, img_size, model.config.in_channels),
        None, tuple(sorted({int(t) for t in capture_steps}, reverse=True)),
    )
    frames = np.asarray(frames)
    grid = make_grid(frames, nrow=frames.shape[0], padding=pad)
    save_image(grid, out_path)
    return grid


def render_denoise_strip_ddim(
    model: UNetDenoiser,
    params,
    sched: DiffusionSchedule,
    *,
    img_size: int = 64,
    ema_params=None,
    seed: Optional[int] = 1234,
    out_path: str = "denoise_strip_ddim.png",
    capture_steps: Optional[Sequence[int]] = None,
    pad: int = 2,
    steps: int = 50,
    eta: float = 0.0,
    schedule_kind: str = "linear",  # "linear" | "cosine"
    schedule_idx: Optional[Sequence[int]] = None,
):
    """DDIM trajectory strip, <=17 frames by default
    (parity: ``ddpim_inference.py:108-197``: 'linear' here means the
    steps-point t-linear ladder, 'cosine' the steps-point 0.5*(1-cos)
    warp — both use ``steps`` points like the reference strip)."""
    p = ema_params if ema_params is not None else params
    kind = "t_linear" if schedule_kind == "linear" else "t_cosine"
    ts = build_ddim_schedule(
        kind, steps, sched.T,
        alphas_cumprod=np.asarray(sched.alphas_cumprod),
        explicit=schedule_idx,
    )
    if capture_steps is None:
        K = min(17, len(ts))
        pick = np.round(np.linspace(0, len(ts) - 1, K)).astype(int)
        capture_steps = [int(ts[i]) for i in pick]
    _, frames = _ddim_jit(
        model, p, sched, jax.random.key(0 if seed is None else seed),
        (1, img_size, img_size, model.config.in_channels),
        tuple(int(t) for t in ts), eta,
        tuple(sorted({int(t) for t in capture_steps}, reverse=True)),
    )
    frames = np.asarray(frames)
    grid = make_grid(frames, nrow=frames.shape[0], padding=pad)
    save_image(grid, out_path)
    return grid
