"""Consistency distillation: one/few-step sampling via self-consistency.

Song et al. 2023 ("Consistency Models") distill a diffusion teacher into a
student f_theta(z_t, t) that maps ANY point of the probability-flow ODE
trajectory straight to its origin x0 — one network forward per sample, with
an optional stochastic multistep refinement.  This complements the
progressive-distillation family (``training/distill.py``): progressive
distillation halves the ladder phase by phase (4+ phases to reach 4 steps);
consistency distillation trains ONE phase and samples at any NFE from 1 up.

The reference has nothing in this family — its fastest sampler is DDIM at
50-150 steps (``/root/reference/src/testing/ddpim_inference.py:19-21``).

Discrete-alpha adaptation (this framework keeps the reference's discrete
tables, ``/root/reference/src/difussion_model/difussion_class.py:35-68``):

- Boundary-condition parameterization (Latent Consistency Models, Luo et
  al. 2023, eq. 5 — the discrete-time form of CM appendix C):

      f(z_t, t) = c_skip(t) * z_t + c_out(t) * x0_hat(z_t, t)

  with ``c_skip = sd^2 / ((s*t)^2 + sd^2)``, ``c_out = s*t /
  sqrt((s*t)^2 + sd^2)`` (sd = sigma_data = 0.5, s = timestep scaling).
  At t=0, (c_skip, c_out) = (1, 0) and z_0 = x0, so f(z_0, 0) = x0 holds
  EXACTLY — the boundary condition is architectural, not learned.
  ``x0_hat`` is the network's x0 estimate in its native parameterization
  (eps/v/x0) via :func:`training.distill.student_x0`, so any trained
  checkpoint distills without conversion.
- CD pairs adjacent points of an (N+1)-point ladder: z_t = q_sample(x0, t),
  one eta=0 DDIM teacher step t -> t' gives z'_t, and the loss pulls
  f_theta(z_t, t) toward stopgrad(f_theta-(z'_t, t')) where theta- is the
  EMA of theta — the framework's existing EMA shadow doubles as the CM
  target network (paper's mu; ``TrainConfig.ema_decay``).
- Distance: pseudo-Huber ``sqrt(||d||^2 + c^2) - c`` with c = 0.00054 *
  sqrt(D) ("Improved Techniques for Training Consistency Models", Song &
  Dhariwal 2023) — smoother gradients than L2 near convergence; ``"l2"``
  keeps the original.
- Classifier-free guidance bakes in exactly as in progressive distillation
  (Meng et al. 2023 stage 1): pass ``guidance=w`` with labeled batches and
  the teacher's eps is the CFG combination, so the student samples guided
  in a single forward.

Everything is one donated jitted step; sampling is a compiled ``lax.scan``
(multistep CM: f -> re-noise to the next ladder point -> f), SPMD-compatible
like every other sampler here.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.diffusion import ddim_step, q_sample
from ..ops.schedules import DiffusionSchedule
from .distill import make_teacher_eps, student_x0
from .ema import ema_update
from .state import TrainConfig, TrainState, init_train_state, make_lr_schedule, make_optimizer
from .step import _split_batch

__all__ = [
    "consistency_ladder",
    "consistency_scalings",
    "consistency_fn",
    "make_consistency_step",
    "consistency_distill",
    "consistency_sample_loop",
    "_cm_from_init_jit",
]

SIGMA_DATA = 0.5  # images live in [-1, 1]
TIMESTEP_SCALING = 10.0  # LCM's s: sharpens c_skip's decay away from t=0
PSEUDO_HUBER_FACTOR = 0.00054  # iCT: c = 0.00054 * sqrt(D)


def consistency_ladder(T: int, num_steps: int) -> np.ndarray:
    """The (N+1)-point strictly-descending ladder T-1 -> 0 used for both CD
    training pairs and multistep consistency sampling."""
    N = int(num_steps)
    if N < 1:
        raise ValueError(f"num_steps must be >= 1, got {N}")
    if N + 1 > T:
        raise ValueError(f"{N + 1} ladder points do not fit in T={T}")
    ladder = np.round(np.linspace(T - 1, 0, N + 1)).astype(np.int32)
    if np.any(np.diff(ladder) >= 0):
        raise ValueError(f"ladder for N={N} at T={T} is not strictly descending")
    return ladder


def consistency_scalings(
    t: jnp.ndarray,
    *,
    sigma_data: float = SIGMA_DATA,
    timestep_scaling: float = TIMESTEP_SCALING,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(c_skip, c_out) enforcing the t=0 boundary condition exactly."""
    st = timestep_scaling * t.astype(jnp.float32)
    c_skip = sigma_data**2 / (st**2 + sigma_data**2)
    c_out = st * jax.lax.rsqrt(st**2 + sigma_data**2)
    return c_skip, c_out


def consistency_fn(
    model,
    params,
    sched: DiffusionSchedule,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
    *,
    y: Optional[jnp.ndarray] = None,
    sigma_data: float = SIGMA_DATA,
    timestep_scaling: float = TIMESTEP_SCALING,
) -> jnp.ndarray:
    """Evaluate f_theta(z_t, t) -> x0-space; f(z_0, 0) == z_0 exactly."""
    y_kw = {"y": y} if y is not None else {}
    out = model.apply(params, z_t, t, **y_kw)
    x0_hat = student_x0(sched, out.astype(jnp.float32), z_t, t)
    c_skip, c_out = consistency_scalings(
        t, sigma_data=sigma_data, timestep_scaling=timestep_scaling)
    shape = (-1,) + (1,) * (z_t.ndim - 1)
    return (c_skip.reshape(shape) * z_t.astype(jnp.float32)
            + c_out.reshape(shape) * x0_hat)


def _distance(pred: jnp.ndarray, target: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Per-sample distance, reduced over all non-batch axes."""
    d = (pred - target).astype(jnp.float32)
    axes = tuple(range(1, d.ndim))
    sq = jnp.sum(d * d, axis=axes)
    if kind == "l2":
        return sq / np.prod(pred.shape[1:])
    if kind == "pseudo_huber":
        dim = float(np.prod(pred.shape[1:]))
        c = PSEUDO_HUBER_FACTOR * np.sqrt(dim)
        return jnp.sqrt(sq + c * c) - c
    raise ValueError(f"unknown consistency distance {kind!r}")


def make_consistency_step(
    model,
    sched: DiffusionSchedule,
    ladder: np.ndarray,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    *,
    guidance: Optional[float] = None,
    distance: str = "pseudo_huber",
    teacher_model=None,
    sigma_data: float = SIGMA_DATA,
    timestep_scaling: float = TIMESTEP_SCALING,
) -> Callable[[TrainState, Any, Any], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted CD step: ``(state, teacher_params, batch) ->
    (state, metrics)``.

    Each sample draws an adjacent ladder pair (t, t'), runs ONE eta=0 DDIM
    teacher step t -> t', and regresses f_theta(z_t, t) onto the EMA
    target's f at (z'_t, t').  ``state.ema_params`` is the CM target
    network theta-; its decay is ``cfg.ema_decay`` (paper's mu).
    """
    teacher_model = teacher_model if teacher_model is not None else model
    ladder = np.asarray(ladder, dtype=np.int32)
    if ladder.ndim != 1 or len(ladder) < 2:
        raise ValueError("ladder must be an (N+1,)-point descending ladder")
    t_hi = jnp.asarray(ladder[:-1])
    t_lo = jnp.asarray(ladder[1:])
    n_pairs = len(ladder) - 1

    num_classes = int(getattr(getattr(model, "config", None), "num_classes", 0))
    lr_schedule = make_lr_schedule(cfg)
    teacher_eps = make_teacher_eps(teacher_model, sched, num_classes, guidance)

    def loss_fn(params, target_params, teacher_params, batch, key):
        x0, y = _split_batch(batch, bool(num_classes))
        if y is not None:
            y = jnp.asarray(y, jnp.int32)
        ki, kn = jax.random.split(key)
        B = x0.shape[0]
        i = jax.random.randint(ki, (B,), 0, n_pairs)
        t, tn = t_hi[i], t_lo[i]
        eps = jax.random.normal(kn, x0.shape, dtype=jnp.float32)
        z_t = q_sample(sched, x0, t, eps)

        efn = lambda x, tt: teacher_eps(teacher_params, x, tt, y)
        zero = jnp.zeros_like(z_t)
        z_prev = jax.lax.stop_gradient(
            ddim_step(sched, efn, z_t, t, tn, zero, eta=0.0))

        target = jax.lax.stop_gradient(
            consistency_fn(model, target_params, sched, z_prev, tn, y=y,
                           sigma_data=sigma_data,
                           timestep_scaling=timestep_scaling))
        pred = consistency_fn(model, params, sched, z_t, t, y=y,
                              sigma_data=sigma_data,
                              timestep_scaling=timestep_scaling)
        return jnp.mean(_distance(pred, target, distance))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def consistency_step(state: TrainState, teacher_params, batch):
        rng_next, k_step = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, state.ema_params, teacher_params, batch, k_step)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_decay)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            rng=rng_next,
        )
        return new_state, {
            "loss": loss,
            "grad_norm": grad_norm,
            "lr": lr_schedule(state.step),
        }

    return consistency_step


def consistency_distill(
    model,
    sched: DiffusionSchedule,
    teacher_params,
    make_batches: Callable[[], Iterable[Any]],
    *,
    num_ladder_steps: int,
    updates: int,
    cfg: TrainConfig,
    guidance: Optional[float] = None,
    distance: str = "pseudo_huber",
    seed: int = 0,
    use_ema: bool = True,
    log: Optional[Callable[[str], None]] = print,
    sigma_data: float = SIGMA_DATA,
    timestep_scaling: float = TIMESTEP_SCALING,
) -> Tuple[Any, Dict[str, Any]]:
    """One-phase CD: the teacher's eta=0 DDIM solver over an
    ``num_ladder_steps``-segment ladder supervises the student; returns the
    (EMA by default) student params + an info dict mirroring
    :func:`training.distill.progressive_distill`'s."""
    teacher = jax.tree.map(lambda p: jnp.asarray(p).copy(), teacher_params)
    ladder = consistency_ladder(sched.T, num_ladder_steps)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(teacher, cfg, seed=seed, tx=tx)
    step = make_consistency_step(
        model, sched, ladder, tx, cfg, guidance=guidance, distance=distance,
        sigma_data=sigma_data, timestep_scaling=timestep_scaling)
    losses = []
    it = iter(make_batches())
    for u in range(int(updates)):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(make_batches())
            batch = next(it)
        state, metrics = step(state, teacher, batch)
        losses.append(metrics["loss"])
        if log and (u == 0 or (u + 1) % max(1, updates // 4) == 0):
            log(f"[consistency] update {u+1}/{updates} "
                f"loss {float(metrics['loss']):.5f}")
    final = state.ema_params if use_ema else state.params
    info = {
        "steps": 1,  # a consistency model samples at ANY NFE, 1 up
        "ladder_steps": int(num_ladder_steps),
        # the f_theta parameterization the student was trained under —
        # recorded in checkpoint extra so sample-cm/serving reproduce it
        "sigma_data": float(sigma_data),
        "timestep_scaling": float(timestep_scaling),
        "phases": [{
            "student_steps": 1,
            "updates": int(updates),
            "first_loss": float(losses[0]),
            "last_loss": float(losses[-1]),
        }],
    }
    return jax.tree.map(lambda p: jnp.asarray(p).copy(), final), info


def consistency_sample_loop(
    model,
    params,
    sched: DiffusionSchedule,
    shape: Tuple[int, ...],
    key: jax.Array,
    *,
    steps: int = 1,
    y: Optional[jnp.ndarray] = None,
    sigma_data: float = SIGMA_DATA,
    timestep_scaling: float = TIMESTEP_SCALING,
) -> jnp.ndarray:
    """Multistep consistency sampling (CM paper alg. 1): f from pure noise,
    then ``steps - 1`` stochastic refinements (re-noise to the next ladder
    point, f again).  ``steps=1`` is the single-forward sampler.  One
    compiled ``lax.scan`` like every other sampler here."""
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    ladder = consistency_ladder(sched.T, steps)
    k0, k_loop = jax.random.split(key)
    z = jax.random.normal(k0, shape, dtype=jnp.float32)
    t0 = jnp.full((shape[0],), int(ladder[0]), dtype=jnp.int32)
    x = consistency_fn(model, params, sched, z, t0, y=y,
                       sigma_data=sigma_data, timestep_scaling=timestep_scaling)

    mids = jnp.asarray(ladder[1:-1], dtype=jnp.int32)  # (steps-1,) may be empty

    def body(carry, tm):
        x, k = carry
        k, kn = jax.random.split(k)
        tvec = jnp.full((shape[0],), tm, dtype=jnp.int32)
        eps = jax.random.normal(kn, shape, dtype=jnp.float32)
        z = q_sample(sched, x, tvec, eps)
        x = consistency_fn(model, params, sched, z, tvec, y=y,
                           sigma_data=sigma_data,
                           timestep_scaling=timestep_scaling)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x, k_loop), mids)
    return jnp.clip(x, -1.0, 1.0)


@functools.partial(jax.jit,
                   static_argnames=("model", "sigma_data",
                                    "timestep_scaling"))
def _cm_from_init_jit(model, params, sched, x_init, y=None,
                      sigma_data: float = SIGMA_DATA,
                      timestep_scaling: float = TIMESTEP_SCALING):
    """1-NFE consistency sampling from EXPLICIT init noise — the serving
    coalescer's CM kernel.  Row i depends only on (x_init_i, y_i), so
    coalescing stays per-request deterministic; matches
    :func:`consistency_sample_loop` at ``steps=1`` exactly when ``x_init``
    is the same draw (the service builds it from the request seed the same
    way the loop does).  Guidance is baked into the student at distill
    time, so there is no guidance argument by design."""
    t0 = jnp.full((x_init.shape[0],), int(sched.T) - 1, dtype=jnp.int32)
    x = consistency_fn(model, params, sched, x_init, t0, y=y,
                       sigma_data=sigma_data,
                       timestep_scaling=timestep_scaling)
    return jnp.clip(x, -1.0, 1.0)
