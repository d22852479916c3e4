"""Super-resolution sampling: the conditional upsampler + the full cascade.

Capability BEYOND the reference (which generates 64px and 256px with two
unrelated unconditional models — ``src/testing/ddpim_inference.py`` just
runs whichever checkpoint it's given): an SR3/CDM-style upsampler
(``UNetConfig.cond_channels``, trained with ``TrainConfig.superres_factor``,
ops/superres.py) denoises at the TARGET resolution while seeing the low-res
image as extra input channels, and :func:`cascade_infer_sample` chains a
cheap base model with the upsampler — base-model class control (CFG) and
editing carry through the cascade.

Everything is the standard compiled DDIM scan; the conditioning rides the
``eps_fn`` closure (:func:`~.inference.cfg_eps_fn` ``x_cond=``), so eta,
ladders, CFG, and v-/x0-parameterizations compose unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedules import DiffusionSchedule
from ..ops.superres import upsample_cond
from ..utils.images import grid_nrow, make_grid, save_image
from .inference import _label_vector, cfg_eps_fn
from .loops import ddim_sample_loop, to_unit_interval
from .timesteps import build_ddim_schedule

__all__ = ["upsample_infer_sample", "cascade_infer_sample"]


@functools.partial(jax.jit, static_argnames=("model", "timesteps", "guidance"))
def _upsample_jit(model, params, sched, cond, key, timesteps, eta,
                  y=None, guidance=1.0):
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched, x_cond=cond)
    k_init, k_loop = jax.random.split(key)
    x_init = jax.random.normal(k_init, cond.shape, dtype=jnp.float32)
    x, _ = ddim_sample_loop(
        sched, eps_fn, x_init, k_loop,
        timesteps=np.asarray(timesteps, dtype=np.int32), eta=eta,
        clip_x0=True,
    )
    return x


def _cond_from_low(model, low_images, n: Optional[int]) -> jnp.ndarray:
    """[-1,1] low-res (h,w,C)/(B,h,w,C) -> (n, R, R, C) conditioning on the
    model grid."""
    cfg = model.config
    if not int(getattr(cfg, "cond_channels", 0) or 0):
        raise ValueError(
            "upsampling needs an image-conditional checkpoint "
            "(cond_channels > 0; train with TrainConfig.superres_factor)")
    arr = jnp.asarray(low_images, jnp.float32)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4:
        raise ValueError(f"expected (h,w,C) or (B,h,w,C), got {arr.shape}")
    if n is not None and arr.shape[0] != n:
        if arr.shape[0] != 1:
            raise ValueError(
                f"got batch {arr.shape[0]} but n={n}; pass one image to "
                "replicate or a batch of exactly n")
        arr = jnp.broadcast_to(arr, (n, *arr.shape[1:]))
    return upsample_cond(arr, cfg.img_resolution)


def upsample_infer_sample(
    model,
    params,
    sched: DiffusionSchedule,
    low_images,
    *,
    n: Optional[int] = None,
    steps: int = 50,
    eta: float = 0.0,
    schedule_kind: str = "t_linear",
    seed: Optional[int] = 1234,
    ema_params=None,
    out_path: Optional[str] = "samples_upsampled.png",
    class_id=None,
    guidance: float = 1.0,
):
    """Upsample ``low_images`` ([-1,1] model space, any resolution <= the
    model's) to the checkpoint's ``img_resolution``.  A single image with
    ``n`` set is replicated n times (independent noise per row — the grid
    shows n consistent super-resolutions).  Returns the [0,1] batch."""
    p = ema_params if ema_params is not None else params
    cond = _cond_from_low(model, low_images, n)
    ts = build_ddim_schedule(
        schedule_kind, steps, sched.T,
        alphas_cumprod=np.asarray(sched.alphas_cumprod))
    x = _upsample_jit(
        model, p, sched, cond, jax.random.key(0 if seed is None else seed),
        tuple(int(t) for t in ts), float(eta),
        y=_label_vector(class_id, cond.shape[0]), guidance=float(guidance),
    )
    x01 = np.asarray(to_unit_interval(x))
    if out_path is not None:
        save_image(make_grid(x01, nrow=grid_nrow(x01.shape[0])), out_path)
    return x01


def cascade_infer_sample(
    base_model,
    base_params,
    base_sched: DiffusionSchedule,
    sr_model,
    sr_params,
    sr_sched: DiffusionSchedule,
    *,
    n: int = 4,
    base_steps: int = 50,
    sr_steps: int = 50,
    eta: float = 0.0,
    schedule_kind: str = "t_linear",
    seed: Optional[int] = 1234,
    out_path: Optional[str] = "samples_cascade.png",
    out_low_path: Optional[str] = None,
    class_id=None,
    guidance: float = 1.0,
):
    """Two-stage cascade: sample the base model at its resolution, then
    upsample every sample with the SR model.  ``class_id``/``guidance``
    steer the BASE stage (the upsampler is content-agnostic; pass a
    conditional SR checkpoint and they apply there too via
    :func:`upsample_infer_sample` directly).  Returns ``(low01, hi01)``.
    """
    from .inference import _ddim_jit

    base_res = base_model.config.img_resolution
    ts = build_ddim_schedule(
        schedule_kind, base_steps, base_sched.T,
        alphas_cumprod=np.asarray(base_sched.alphas_cumprod))
    low, _ = _ddim_jit(
        base_model, base_params, base_sched,
        jax.random.key(0 if seed is None else seed),
        (n, base_res, base_res, base_model.config.in_channels),
        tuple(int(t) for t in ts), float(eta), None,
        y=_label_vector(class_id, n), guidance=float(guidance),
    )
    low01 = np.asarray(to_unit_interval(low))
    if out_low_path is not None:
        save_image(make_grid(low01, nrow=grid_nrow(n)), out_low_path)
    hi01 = upsample_infer_sample(
        sr_model, sr_params, sr_sched, low01 * 2.0 - 1.0,
        n=n, steps=sr_steps, eta=eta, schedule_kind=schedule_kind,
        seed=None if seed is None else seed + 1, out_path=out_path,
    )
    return low01, hi01
