"""Image-editing samplers: img2img (SDEdit) and inpainting (RePaint-style).

Capabilities BEYOND the reference (which only draws unconditional grids,
``src/testing/ddpm_inference.py`` / ``ddpim_inference.py``) but built from
the same primitives it has: ``q_sample`` runs the forward process to a chosen
depth, and the DDIM reverse scan finishes the trajectory.  Both editors are
single compiled ``lax.scan`` programs like every other sampler here, consume
the standard ``eps_fn`` closure (so CFG and v-/x0-parameterizations compose
via :func:`~.inference.cfg_eps_fn`), and run under jit on any mesh.

- **img2img** (SDEdit, Meng et al. 2021): noise a real image to an
  intermediate t via ``q_sample``, then denoise along the TAIL of a DDIM
  ladder.  ``strength`` in (0,1] picks the fraction of the ladder to run:
  small = faithful edit, 1.0 = nearly-from-scratch generation.
- **inpaint** (replace-method; RePaint, Lugmayr et al. 2022 with optional
  resampling): the mask=1 region is pinned to the forward-process state of
  the known image at every step, the mask=0 region is generated; an exact
  paste at the end guarantees the known pixels survive bit-for-bit.
  ``resamples > 1`` re-noises t_prev -> t_cur and redoes each step, letting
  the generated region re-harmonize with the known context (the RePaint
  quality trick), still inside the one scan.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.diffusion import EpsFn, ddim_step, q_sample
from ..ops.schedules import DiffusionSchedule, extract
from ..utils.images import grid_nrow, make_grid, save_image
from .inference import _label_vector, cfg_eps_fn
from .timesteps import build_ddim_schedule

__all__ = [
    "truncate_ladder",
    "img2img_sample_loop",
    "inpaint_sample_loop",
    "img2img_infer_sample",
    "inpaint_infer_sample",
    "box_mask",
]


def truncate_ladder(timesteps: np.ndarray, strength: float) -> np.ndarray:
    """Tail of a descending DDIM ladder covering ``strength`` of the steps.

    ``strength`` in (0, 1]: 1.0 keeps the whole ladder (generation from
    nearly pure noise), 0.1 keeps only the last 10% of steps (a light
    touch-up).  At least TWO ladder entries are always kept: the final
    entry is the t=0 terminator that the DDIM grid loop does not step
    (``loops.py`` n_iter = len-1), so a one-entry tail would run ZERO
    model calls and return pure q_sample noise.
    """
    s = float(strength)
    if not 0.0 < s <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    ts = np.asarray(timesteps, dtype=np.int32)
    n_keep = min(len(ts), max(2, int(round(s * len(ts)))))
    return ts[len(ts) - n_keep:]


def img2img_sample_loop(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    init_x0: jnp.ndarray,
    key: jax.Array,
    *,
    timesteps: np.ndarray,
    eta: float = 0.0,
    clip_x0: Optional[bool] = None,
) -> jnp.ndarray:
    """SDEdit core: q_sample ``init_x0`` to the ladder's first t, then run
    the DDIM reverse scan over the (already truncated) ``timesteps``.

    ``timesteps`` is a descending ladder (use :func:`truncate_ladder` on a
    :func:`~.timesteps.build_ddim_schedule` ladder to encode strength).
    Jit-safe: ladder is static, shapes fixed.
    """
    from .loops import ddim_sample_loop

    ts = np.asarray(timesteps, dtype=np.int32)
    B = init_x0.shape[0]
    t0 = jnp.full((B,), int(ts[0]), dtype=jnp.int32)
    k_noise, k_loop = jax.random.split(key)
    eps = jax.random.normal(k_noise, init_x0.shape, dtype=init_x0.dtype)
    x_t = q_sample(sched, init_x0, t0, eps)
    x, _ = ddim_sample_loop(
        sched, eps_fn, x_t, k_loop, timesteps=ts, eta=eta, clip_x0=clip_x0
    )
    return x


def inpaint_sample_loop(
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    known_x0: jnp.ndarray,
    mask: jnp.ndarray,
    x_init: jnp.ndarray,
    key: jax.Array,
    *,
    timesteps: np.ndarray,
    eta: float = 0.0,
    resamples: int = 1,
    clip_x0: Optional[bool] = None,
) -> jnp.ndarray:
    """Replace-method inpainting over a DDIM ladder, one compiled scan.

    ``mask``: 1 = KNOWN (kept from ``known_x0``), 0 = generated; any shape
    broadcastable to ``known_x0`` (e.g. (H, W, 1)).  Before every model call
    the known region is set to ``q_sample(known_x0, t_cur)`` so the network
    always sees forward-process-consistent context; after the scan the known
    region is pasted back exactly.

    ``resamples``: RePaint-style harmonization — each ladder step is done
    ``resamples`` times, re-noising x from t_prev back to t_cur between
    repeats (ancestral q(x_t | x_{t_prev}) using the ab-ratio).  1 = plain
    replace method.
    """
    if resamples < 1:
        raise ValueError(f"resamples must be >= 1, got {resamples}")
    ts = np.asarray(timesteps, dtype=np.int32)
    t_cur = ts
    t_prev = np.concatenate([ts[1:], np.zeros((1,), np.int32)])
    # grid sampler semantics (no strip capture): skip the final 0->0 step,
    # matching ddim_sample_loop's n_frames==0 branch
    n_iter = len(ts) - 1 if len(ts) > 1 else 1
    B = x_init.shape[0]
    mask = jnp.asarray(mask, x_init.dtype)
    R = int(resamples)

    def body(x, step):
        tc, tp = step
        t = jnp.full((B,), tc, dtype=jnp.int32)
        tprev = jnp.full((B,), tp, dtype=jnp.int32)
        k_step = jax.random.fold_in(key, tc)

        def one(r, x):
            kr = jax.random.fold_in(k_step, r)
            k_known, k_ddim, k_back = jax.random.split(kr, 3)
            # pin the known region to its forward-process state at t_cur
            x_known = q_sample(
                sched, known_x0, t,
                jax.random.normal(k_known, x.shape, dtype=x.dtype))
            x = mask * x_known + (1.0 - mask) * x
            x_next = ddim_step(
                sched, eps_fn, x, t, tprev,
                jax.random.normal(k_ddim, x.shape, dtype=x.dtype),
                eta=eta, clip_x0=clip_x0)
            if R == 1:
                return x_next
            # re-noise t_prev -> t_cur for the next repeat (skipped on the
            # last repeat): q(x_tc | x_tp) with ab ratio ab_tc / ab_tp
            ab_c = extract(sched.alphas_cumprod, t, x.ndim)
            ab_p = extract(sched.alphas_cumprod, tprev, x.ndim)
            ratio = jnp.clip(ab_c / jnp.maximum(ab_p, 1e-12), 0.0, 1.0)
            z = jax.random.normal(k_back, x.shape, dtype=x.dtype)
            x_back = jnp.sqrt(ratio) * x_next + jnp.sqrt(1.0 - ratio) * z
            return jnp.where(r < R - 1, x_back, x_next)

        x = jax.lax.fori_loop(0, R, one, x)
        return x, None

    xs = (jnp.asarray(t_cur[:n_iter]), jnp.asarray(t_prev[:n_iter]))
    x, _ = jax.lax.scan(body, x_init, xs)
    # exact paste: the known pixels survive bit-for-bit
    return mask * known_x0 + (1.0 - mask) * x


@functools.partial(
    jax.jit, static_argnames=("model", "timesteps", "guidance")
)
def _img2img_jit(model, params, sched, init_x0, key, timesteps, eta,
                 y=None, guidance=1.0):
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    return img2img_sample_loop(
        sched, eps_fn, init_x0, key,
        timesteps=np.asarray(timesteps, dtype=np.int32), eta=eta,
        clip_x0=True,
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "timesteps", "resamples", "guidance"),
)
def _inpaint_jit(model, params, sched, known_x0, mask, key, timesteps, eta,
                 resamples, y=None, guidance=1.0):
    eps_fn = cfg_eps_fn(model, params, y, guidance, sched=sched)
    k_init, k_loop = jax.random.split(key)
    x_init = jax.random.normal(k_init, known_x0.shape, dtype=jnp.float32)
    return inpaint_sample_loop(
        sched, eps_fn, known_x0, mask, x_init, k_loop,
        timesteps=np.asarray(timesteps, dtype=np.int32), eta=eta,
        resamples=resamples, clip_x0=True,
    )


def _as_batch(images: np.ndarray, n: Optional[int]) -> jnp.ndarray:
    """(H,W,C) or (B,H,W,C) in model space [-1,1] -> (n,H,W,C)."""
    arr = jnp.asarray(images, jnp.float32)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4:
        raise ValueError(f"expected (H,W,C) or (B,H,W,C), got {arr.shape}")
    if n is not None and arr.shape[0] != n:
        if arr.shape[0] != 1:
            raise ValueError(
                f"got batch {arr.shape[0]} but n={n}; pass one image to "
                "replicate or a batch of exactly n")
        arr = jnp.broadcast_to(arr, (n, *arr.shape[1:]))
    return arr


def _save_grid(x01: np.ndarray, out_path: Optional[str]):
    if out_path is None:
        return None
    save_image(make_grid(x01, nrow=grid_nrow(x01.shape[0])), out_path)


def img2img_infer_sample(
    model,
    params,
    sched: DiffusionSchedule,
    init_images,
    *,
    n: Optional[int] = None,
    strength: float = 0.6,
    steps: int = 50,
    eta: float = 0.0,
    schedule_kind: str = "t_linear",
    seed: Optional[int] = 1234,
    ema_params=None,
    out_path: Optional[str] = "samples_img2img.png",
    class_id=None,
    guidance: float = 1.0,
):
    """SDEdit grid inference: edit ``init_images`` ([-1,1] model space,
    (H,W,C) or (B,H,W,C)) at the given ``strength``.  A single image with
    ``n`` set is replicated n times (each row gets independent noise, so the
    grid shows n variations).  Returns the [0,1] batch."""
    p = ema_params if ema_params is not None else params
    init = _as_batch(init_images, n)
    ts = build_ddim_schedule(
        schedule_kind, steps, sched.T,
        alphas_cumprod=np.asarray(sched.alphas_cumprod))
    ts = truncate_ladder(ts, strength)
    x = _img2img_jit(
        model, p, sched, init, jax.random.key(0 if seed is None else seed),
        tuple(int(t) for t in ts), float(eta),
        y=_label_vector(class_id, init.shape[0]), guidance=float(guidance),
    )
    from .loops import to_unit_interval

    x01 = np.asarray(to_unit_interval(x))
    _save_grid(x01, out_path)
    return x01


def inpaint_infer_sample(
    model,
    params,
    sched: DiffusionSchedule,
    known_images,
    mask,
    *,
    n: Optional[int] = None,
    steps: int = 50,
    eta: float = 0.0,
    resamples: int = 1,
    schedule_kind: str = "t_linear",
    seed: Optional[int] = 1234,
    ema_params=None,
    out_path: Optional[str] = "samples_inpaint.png",
    class_id=None,
    guidance: float = 1.0,
):
    """Inpainting grid inference: regenerate the mask=0 region of
    ``known_images`` ([-1,1] model space); mask=1 pixels are kept exactly.
    ``mask`` broadcasts ((H,W,1) covers the whole batch).  Returns the
    [0,1] batch."""
    p = ema_params if ema_params is not None else params
    known = _as_batch(known_images, n)
    ts = build_ddim_schedule(
        schedule_kind, steps, sched.T,
        alphas_cumprod=np.asarray(sched.alphas_cumprod))
    x = _inpaint_jit(
        model, p, sched, known, jnp.asarray(mask, jnp.float32),
        jax.random.key(0 if seed is None else seed),
        tuple(int(t) for t in ts), float(eta), int(resamples),
        y=_label_vector(class_id, known.shape[0]), guidance=float(guidance),
    )
    from .loops import to_unit_interval

    x01 = np.asarray(to_unit_interval(x))
    _save_grid(x01, out_path)
    return x01


def box_mask(img_size: int, box: Sequence[int], channels: int = 1) -> np.ndarray:
    """(H,W,channels) mask with 0 (= generate) inside the pixel box
    ``(x0, y0, x1, y1)`` (half-open) and 1 (= keep) outside — the CLI's
    mask-from-coordinates convenience."""
    x0, y0, x1, y1 = (int(v) for v in box)
    if not (0 <= x0 < x1 <= img_size and 0 <= y0 < y1 <= img_size):
        raise ValueError(
            f"box {box} out of bounds for img_size={img_size} "
            "(need 0 <= x0 < x1 <= size, same for y)")
    m = np.ones((img_size, img_size, channels), dtype=np.float32)
    m[y0:y1, x0:x1, :] = 0.0
    return m
