"""Progressive distillation: halve the sampling ladder, repeatedly.

Salimans & Ho 2022 ("Progressive Distillation for Fast Sampling of
Diffusion Models") adapted to this framework's discrete-alpha tables: a
student is trained so that ONE eta=0 DDIM step t -> t'' reproduces what the
teacher achieves in TWO steps t -> t' -> t''; after a phase the student
becomes the next teacher and the ladder halves again.  Four phases turn a
DDIM-64 sampler into a 4-step one.

The reference has nothing in this family — its fastest sampler is DDIM at
50-150 steps (``/root/reference/src/testing/ddpim_inference.py:19-21``) and
every sample costs that many full U-Net forwards.  Distillation is the
capability answer to the same goal (few-NFE sampling) rather than a port of
anything: samples/s scales ~linearly with the NFE reduction, on top of the
compiled-scan and SPMD wins the samplers already have.

Design notes (all jit-native):

- Targets are computed by inverting the closed-form eta=0 DDIM step: given
  the teacher's two-step landing point z'', the x0 that a SINGLE step from
  z_t would need is

      x~ = (z'' - (s''/s) z_t) / (a'' - (s''/s) a)        [paper eq. 9]

  with a = sqrt(alpha_bar), s = sqrt(1 - alpha_bar) drawn from the same
  tables the samplers use, so a distilled student samples through the
  UNCHANGED ``ddim_sample_loop`` (ladder = ``build_ddim_schedule("linear",
  N)``).  At the final segment (t'' = 0's table entry) the denominator is
  ~1 and the target reduces to z'' itself.
- The regression runs in x0 space with the paper's truncated-SNR weight
  max(SNR, 1) (Appendix G), regardless of the network's native
  parameterization — the output is converted by :func:`student_x0`.
  v- or x0-prediction teachers distill out of the box; epsilon-prediction
  works but is the paper's known-worst choice at few steps (the eps->x0
  conversion divides by sqrt(alpha_bar), amplifying high-t error).
- Classifier-free guidance is BAKED IN by distilling against the guided
  teacher (Meng et al. 2023, stage-1): pass ``guidance=w`` and labeled
  batches, and the student learns eps(x, t, y) that already includes the
  w-scaled combination — sampling the student needs no doubled forward.
- One phase = one jitted, donated train step (teacher params are an
  explicit argument, not a closure constant, so the 31M-param teacher is
  not baked into the executable); both teacher steps and the student
  forward run deterministically (no dropout — distillation matches
  functions, not data).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.diffusion import ddim_step, model_output_to_eps, q_sample
from ..ops.schedules import DiffusionSchedule, extract
from .ema import ema_update
from .state import TrainConfig, TrainState, init_train_state, make_lr_schedule, make_optimizer
from .step import _split_batch

__all__ = [
    "distill_ladder",
    "student_timesteps",
    "onestep_target",
    "student_x0",
    "make_teacher_eps",
    "make_distill_step",
    "progressive_distill",
]


def make_teacher_eps(
    teacher_model,
    sched: DiffusionSchedule,
    num_classes: int,
    guidance: Optional[float],
) -> Callable[..., jnp.ndarray]:
    """``(teacher_params, x, t, y) -> eps`` for a distillation teacher.

    When ``guidance`` is set (and the model is conditional with labels), the
    eps is the classifier-free combination ``e_u + w (e_c - e_u)`` computed
    in one doubled forward — the Meng et al. 2023 stage-1 teacher that bakes
    CFG into the student.  Shared by progressive (``make_distill_step``) and
    consistency (``training/consistency.py``) distillation.
    """
    w = None if guidance is None else float(guidance)

    def teacher_eps(tp, x, t, y):
        if num_classes and y is not None and w is not None and w != 1.0:
            xx = jnp.concatenate([x, x])
            tt = jnp.concatenate([t, t])
            yy = jnp.concatenate([y, jnp.full_like(y, num_classes)])
            out = teacher_model.apply(tp, xx, tt, y=yy)
            o_c, o_u = jnp.split(out, 2)
            out = (o_u.astype(jnp.float32)
                   + w * (o_c.astype(jnp.float32) - o_u.astype(jnp.float32))
                   ).astype(x.dtype)
        elif num_classes and y is not None:
            out = teacher_model.apply(tp, x, t, y=y)
        else:
            out = teacher_model.apply(tp, x, t)
        return model_output_to_eps(sched, out, x, t)

    return teacher_eps


def distill_ladder(T: int, num_student_steps: int) -> np.ndarray:
    """The (2N+1)-point descending teacher ladder for an N-step student.

    Every other entry (``ladder[::2]``) is the student's own ladder, and —
    because subsampling a linspace is a linspace — it equals
    ``build_ddim_schedule("linear", N, T)`` exactly, so the standard DDIM
    sampler replays the distilled trajectory with no special cases.
    """
    N = int(num_student_steps)
    if N < 1:
        raise ValueError(f"num_student_steps must be >= 1, got {N}")
    if 2 * N + 1 > T:
        raise ValueError(
            f"2*{N}+1 teacher points do not fit in T={T} discrete steps")
    full = np.round(np.linspace(T - 1, 0, 2 * N + 1)).astype(np.int32)
    if np.any(np.diff(full) >= 0):
        raise ValueError(
            f"ladder for N={N} at T={T} is not strictly descending")
    return full


def student_timesteps(ladder: np.ndarray) -> np.ndarray:
    """The N-step student ladder embedded in a teacher ladder."""
    return np.asarray(ladder)[::2].astype(np.int32)


def onestep_target(
    sched: DiffusionSchedule,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
    t_next: jnp.ndarray,
    z_next: jnp.ndarray,
) -> jnp.ndarray:
    """Solve for the x0 a single eta=0 DDIM step t -> t_next needs to land
    exactly on ``z_next``.

    Inverts ``ops.diffusion.ddim_step`` at eta=0 (clipping aside):
    z'' = a'' x~ + s'' (z_t - a x~)/s  =>  x~ = (z'' - r z_t)/(a'' - r a),
    r = s''/s.  The denominator is positive whenever alpha_bar strictly
    increases from t to t_next (t_next < t), which the distillation ladders
    guarantee.
    """
    ab_t = extract(sched.alphas_cumprod, t, z_t.ndim)
    ab_n = extract(sched.alphas_cumprod, t_next, z_t.ndim)
    ratio = jnp.sqrt((1.0 - ab_n) / (1.0 - ab_t + 1e-12))
    denom = jnp.sqrt(ab_n) - ratio * jnp.sqrt(ab_t)
    return (z_next - ratio * z_t) / jnp.maximum(denom, 1e-8)


def student_x0(
    sched: DiffusionSchedule,
    out: jnp.ndarray,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Network output (in ``sched.prediction_type``'s native space) -> the
    UNCLIPPED x0 estimate the distillation loss regresses."""
    kind = sched.prediction_type
    if kind == "x0":
        return out
    a = extract(sched.sqrt_alphas_cumprod, t, z_t.ndim)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, z_t.ndim)
    if kind == "v":
        return a * z_t - s * out
    if kind == "epsilon":
        return (z_t - s * out) / (a + 1e-12)
    if kind == "flow":
        # u = eps - x0 and z_t = a x0 + s eps  =>  x0 = (z_t - s u)/(a + s);
        # a + s >= 1 for any schedule, so no epsilon guard is needed
        # (mirrors ops.diffusion.model_output_to_eps's flow branch)
        return (z_t - s * out) / (a + s)
    raise ValueError(f"unknown prediction_type {kind!r}")


def _distill_weight(sched: DiffusionSchedule, t: jnp.ndarray, kind: str) -> jnp.ndarray:
    ab = jnp.take(sched.alphas_cumprod, jnp.clip(t, 0, sched.T - 1))
    snr = ab / (1.0 - ab)
    if kind == "truncated_snr":
        return jnp.maximum(snr, 1.0)  # paper Appendix G: max(SNR, 1)
    if kind == "snr":
        return snr
    if kind == "uniform":
        return jnp.ones_like(snr)
    raise ValueError(f"unknown distill weighting {kind!r}")


def make_distill_step(
    model,
    sched: DiffusionSchedule,
    ladder: np.ndarray,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    *,
    guidance: Optional[float] = None,
    weighting: str = "truncated_snr",
    teacher_model=None,
) -> Callable[[TrainState, Any, Any], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted distillation step for one phase.

    ``(state, teacher_params, batch) -> (state, metrics)`` — ``batch`` is
    images or ``(images, labels)`` for conditional models.  Each sample
    draws its own ladder segment i ~ U{0..N-1} (the distillation analogue of
    t ~ U{1..T-1} in DDPM training), takes z_t = q_sample(x0, t_i), runs the
    teacher two eta=0 DDIM half-steps, and regresses the student's x0
    estimate onto the inverted one-step target with ``weighting``.

    ``guidance``: when set (and the model is conditional with labeled
    batches), the teacher's eps is the CFG combination at that fixed w —
    the student distills the GUIDED sampler.
    """
    teacher_model = teacher_model if teacher_model is not None else model
    ladder = np.asarray(ladder, dtype=np.int32)
    if ladder.ndim != 1 or len(ladder) < 3 or (len(ladder) - 1) % 2:
        raise ValueError("ladder must be a (2N+1,)-point teacher ladder")
    n_seg = (len(ladder) - 1) // 2
    t_hi = jnp.asarray(ladder[0:-2:2])
    t_mid = jnp.asarray(ladder[1:-1:2])
    t_lo = jnp.asarray(ladder[2::2])

    num_classes = int(getattr(getattr(model, "config", None), "num_classes", 0))
    lr_schedule = make_lr_schedule(cfg)
    teacher_eps = make_teacher_eps(teacher_model, sched, num_classes, guidance)

    def loss_fn(params, teacher_params, batch, key: jax.Array) -> jnp.ndarray:
        x0, y = _split_batch(batch, bool(num_classes))
        if y is not None:
            y = jnp.asarray(y, jnp.int32)
        ki, kn = jax.random.split(key)
        B = x0.shape[0]
        i = jax.random.randint(ki, (B,), 0, n_seg)
        t, tm, tn = t_hi[i], t_mid[i], t_lo[i]
        eps = jax.random.normal(kn, x0.shape, dtype=jnp.float32)
        z_t = q_sample(sched, x0, t, eps)

        efn = lambda x, tt: teacher_eps(teacher_params, x, tt, y)
        zero = jnp.zeros_like(z_t)
        z_mid = ddim_step(sched, efn, z_t, t, tm, zero, eta=0.0)
        z_next = ddim_step(sched, efn, z_mid, tm, tn, zero, eta=0.0)
        x_tilde = jax.lax.stop_gradient(onestep_target(sched, z_t, t, tn, z_next))

        y_kw = {"y": y} if (num_classes and y is not None) else {}
        out = model.apply(params, z_t, t, **y_kw)
        x_hat = student_x0(sched, out, z_t, t)

        diff = (x_tilde - x_hat).astype(jnp.float32)
        reduce_axes = tuple(range(1, x0.ndim))
        mse = jnp.mean(diff * diff, axis=reduce_axes)
        return jnp.mean(mse * _distill_weight(sched, t, weighting))

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def distill_step(state: TrainState, teacher_params, batch):
        rng_next, k_step = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, teacher_params, batch, k_step)
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

    return distill_step


def progressive_distill(
    model,
    sched: DiffusionSchedule,
    teacher_params,
    make_batches: Callable[[], Iterable[Any]],
    *,
    start_steps: int,
    end_steps: int,
    phase_updates: int,
    cfg: TrainConfig,
    guidance: Optional[float] = None,
    weighting: str = "truncated_snr",
    seed: int = 0,
    use_ema: bool = True,
    log: Optional[Callable[[str], None]] = print,
) -> Tuple[Any, Dict[str, Any]]:
    """Run the halving phases: a ``start_steps``-capable teacher distills to
    ``start_steps/2``, the (EMA) student becomes the next teacher, down to
    ``end_steps``.

    ``make_batches`` returns a fresh batch iterable per phase (re-iterated
    round-robin until ``phase_updates`` steps are done).  Returns
    ``(params, info)`` where params are the final student's (EMA by default)
    weights and ``info`` records per-phase losses and the final ladder
    (``info["steps"]``-step "linear" ladder, i.e. what
    ``sample-ddim --kind linear --steps N`` uses).
    """
    if start_steps < 2 * end_steps:
        raise ValueError(
            f"start_steps={start_steps} must be >= 2*end_steps={2*end_steps}")
    teacher = jax.tree.map(lambda p: jnp.asarray(p).copy(), teacher_params)
    phases = []
    N = int(start_steps) // 2
    while N >= int(end_steps):
        phases.append(N)
        N //= 2

    info: Dict[str, Any] = {"phases": [], "steps": phases[-1] if phases else start_steps}
    for phase_idx, N in enumerate(phases):
        ladder = distill_ladder(sched.T, N)
        tx = make_optimizer(cfg)
        state, _ = init_train_state(teacher, cfg, seed=seed + phase_idx, tx=tx)
        # Guidance is baked into the FIRST student only (Meng et al. 2023
        # stage 1); later phases' teachers already emit guided eps, so
        # re-applying the CFG combination would amplify guidance w-fold
        # each halving.
        phase_guidance = guidance if phase_idx == 0 else None
        step = make_distill_step(
            model, sched, ladder, tx, cfg,
            guidance=phase_guidance, weighting=weighting)
        losses = []
        it = iter(make_batches())
        for u in range(int(phase_updates)):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(make_batches())
                batch = next(it)
            state, metrics = step(state, teacher, batch)
            losses.append(metrics["loss"])
            if log and (u == 0 or (u + 1) % max(1, phase_updates // 4) == 0):
                log(f"[distill {2*N}->{N}] update {u+1}/{phase_updates} "
                    f"loss {float(metrics['loss']):.5f}")
        final = state.ema_params if use_ema else state.params
        teacher = jax.tree.map(lambda p: jnp.asarray(p).copy(), final)
        info["phases"].append({
            "student_steps": N,
            "updates": int(phase_updates),
            "first_loss": float(losses[0]),
            "last_loss": float(losses[-1]),
        })
    return teacher, info
