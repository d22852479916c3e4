"""The compiled training step: loss, grads, accumulation, clip, update, EMA.

TPU-native redesign of the reference's per-batch Python loop body
(``src/training_loops/train_one_epoch.py:61-121``): everything between
"batch arrives" and "state advanced" is ONE jitted, donated program —
bf16 forward/backward, fp32 master params and loss, gradient accumulation as
a ``lax.scan`` over microbatches (the reference simulates it with loss/k and
deferred ``optimizer.step``, ``train_one_epoch.py:75,82``), global-norm clip,
AdamW with warmup schedule, and the EMA pytree lerp — no GradScaler (bf16
needs none) and no OOM-skip (XLA memory is planned statically; use
``remat=True`` on the model for the 256px configs instead).

Also here: the diagnostics the reference prints per step — grad-norm
(pre-clip, ``training_utils.py:128-133``) and fixed-timestep probe losses
(``train_one_epoch.py:134-142``) — as separate jitted functions so the hot
step never pays for them unless called.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.unet import UNetDenoiser
from ..ops.diffusion import loss_simple, sample_timesteps
from ..ops.schedules import DiffusionSchedule
from .ema import ema_update
from .state import TrainConfig, TrainState, make_lr_schedule

__all__ = ["make_train_step", "make_probe_fn", "make_loss_fn",
           "make_eval_step", "resolve_weight_fn"]

Metrics = Dict[str, jnp.ndarray]


def _dropout_key(key: jax.Array, impl: str) -> jax.Array:
    """Re-key the dropout stream onto a (possibly faster) PRNG family.

    ``"rbg"`` maps the threefry-derived key onto the TPU's hardware
    RngBitGenerator — ~3x cheaper bits for the ~560M bernoulli draws a 64px
    train forward makes (22 ResBlock masks).  Masks stay deterministic in
    the step key; only WHICH decorrelated mask is drawn changes, which has
    no training semantics.  ``"threefry"`` is the JAX default stream."""
    if impl in (None, "threefry", "threefry2x32"):
        return key
    if impl == "rbg":
        data = jax.random.key_data(key)  # (2,) uint32 for threefry keys
        return jax.random.wrap_key_data(
            jnp.concatenate([data, data]), impl="rbg"
        )
    raise ValueError(f"unknown dropout_rng_impl {impl!r}")


def _split_batch(batch, conditional: bool):
    """``batch`` is images, or ``(images, labels)`` for conditional models."""
    if conditional:
        if not (isinstance(batch, (tuple, list)) and len(batch) == 2):
            raise ValueError(
                "conditional model (num_classes > 0) needs (images, labels) "
                "batches — got a bare array; use a labeled data source")
        return batch[0], batch[1]
    if isinstance(batch, (tuple, list)):
        return batch[0], None
    return batch, None


def _check_superres(mcfg, superres_factor: int) -> int:
    """Validate the superres knobs against the model config; returns the
    factor (0 = off).  A cond_channels model REQUIRES superres training
    (the loss must build x_cond) and vice versa."""
    f = int(superres_factor or 0)
    cond_ch = int(getattr(mcfg, "cond_channels", 0) or 0)
    if f and not cond_ch:
        raise ValueError(
            "TrainConfig.superres_factor set but the model has no "
            "cond_channels — use e.g. unet_256x256_config(cond_channels=3)")
    if cond_ch and not f:
        raise ValueError(
            "image-conditional model (cond_channels > 0) needs "
            "TrainConfig.superres_factor >= 2 so the loss can build x_cond")
    if f and cond_ch != int(getattr(mcfg, "in_channels", 3)):
        raise ValueError(
            f"superres training derives x_cond from the batch itself, so "
            f"cond_channels ({cond_ch}) must equal in_channels "
            f"({getattr(mcfg, 'in_channels', 3)})")
    return f


def make_loss_fn(model: UNetDenoiser, sched: DiffusionSchedule, weight_fn=None,
                 dropout_rng_impl: str = "threefry",
                 cond_dropout: float = 0.1,
                 superres_factor: int = 0,
                 cond_aug: float = 0.0):
    """(params, batch, key) -> scalar L_simple with fresh t ~ U{1..T-1} and
    fresh noise, dropout active (training mode).  ``batch`` is images, or
    ``(images, labels)`` when the model is class-conditional
    (``num_classes > 0``) — each sample's label is replaced by the NULL
    token with probability ``cond_dropout`` (classifier-free guidance
    training, Ho & Salimans 2022).

    ``weight_fn(t, sched) -> (B,)`` enables per-sample loss re-weighting —
    the ``weight`` argument of the reference's ``loss_simple``
    (``difussion_class.py:101,114-115``), which its own training loop never
    wires up; here it is a first-class TrainConfig knob (see
    :func:`resolve_weight_fn` for the built-in schemes)."""

    # MoE models (DiTConfig.num_experts > 0) return a router load-balance
    # loss alongside eps; add it with the config's weight.  loss_simple
    # calls eps_fn exactly once, so the trace-time stash is sound.
    mcfg = getattr(model, "config", None)
    aux_weight = (float(getattr(mcfg, "moe_aux_weight", 0.0))
                  if getattr(mcfg, "num_experts", 0) else 0.0)
    num_classes = int(getattr(mcfg, "num_classes", 0))
    sr_factor = _check_superres(mcfg, superres_factor)

    def loss_fn(params, batch, key: jax.Array) -> jnp.ndarray:
        x, y = _split_batch(batch, bool(num_classes))
        if num_classes:
            kt, kn, kd, ky = jax.random.split(key, 4)
            y = jnp.asarray(y, jnp.int32)
            if cond_dropout > 0.0:
                drop = jax.random.bernoulli(ky, cond_dropout, y.shape)
                y = jnp.where(drop, num_classes, y)  # NULL token
        else:
            # split of 3, NOT 4: keeps unconditional (t, noise, mask) draws
            # bit-identical to every pre-conditional checkpoint/run
            kt, kn, kd = jax.random.split(key, 3)
        kd = _dropout_key(kd, dropout_rng_impl)
        t = sample_timesteps(kt, x.shape[0], sched.T)
        noise = jax.random.normal(kn, x.shape, dtype=jnp.float32)
        aux_box = []

        cond_kw = {}
        if sr_factor:
            # self-supervised SR conditioning: the batch's own low-res view
            # (+ optional Gaussian aug).  fold_in keeps the (t, noise, mask)
            # streams identical to non-SR runs with the same key.
            from ..ops.superres import aug_cond, build_cond

            cond = build_cond(x, sr_factor)
            cond = aug_cond(jax.random.fold_in(key, 1729), cond, cond_aug)
            cond_kw = {"x_cond": cond}

        def eps_fn(x_t, tt):
            y_kw = {"y": y} if num_classes else {}
            if aux_weight:
                eps, aux = model.apply(
                    params, x_t, tt, deterministic=False,
                    rngs={"dropout": kd}, return_aux=True, **y_kw, **cond_kw,
                )
                aux_box.append(aux)
                return eps
            return model.apply(
                params, x_t, tt, deterministic=False, rngs={"dropout": kd},
                **y_kw, **cond_kw,
            )

        weight = weight_fn(t, sched) if weight_fn is not None else None
        loss = loss_simple(sched, eps_fn, x, t, noise, weight=weight)
        if aux_weight:
            (aux,) = aux_box
            loss = loss + aux_weight * aux
        return loss

    return loss_fn


def resolve_weight_fn(name):
    """Built-in per-timestep loss weightings, defined in EPS space.

    - None / "uniform": plain L_simple in the network's native space (the
      reference's default for epsilon; the conventional plain-v-MSE for v)
    - "snr":  w = SNR(t) = ab/(1-ab) — the 'true' VLB eps-weighting
    - "p2":   w = 1/(1+SNR(t)) — perception-prioritized (Choi et al.),
              down-weights the low-noise steps that dominate L_simple
    - "min_snr_5": w = min(SNR, 5)/SNR — Min-SNR-gamma truncation

    Under ``sched.prediction_type != "epsilon"`` the named weightings are
    converted into the native space so the EFFECTIVE objective is the same
    one the name means, independent of what the network outputs: at fixed
    (x_t, t), err_v = err_eps/sqrt(ab) and err_x0 = -sqrt((1-ab)/ab) err_eps,
    so w_native = w_eps * ab (v) or w_eps * SNR (x0); for "flow"
    (u = eps - x0), err_eps = a/(a+b) err_u with a = sqrt(ab), b =
    sqrt(1-ab), so w_native = w_eps * ab/(a+b)^2.  E.g. "min_snr_5"
    under v yields exactly the Min-SNR paper's min(SNR,5)/(SNR+1).
    Uniform is intentionally NOT converted — plain native-space MSE is the
    standard loss for each parameterization.
    """
    if name in (None, "uniform"):
        return None

    def ab_of(t, sched):
        return jnp.take(sched.alphas_cumprod, jnp.clip(t, 0, sched.T - 1))

    def snr_of(t, sched):
        ab = ab_of(t, sched)
        return ab / (1.0 - ab)

    def native(w_eps):
        def fn(t, sched):
            w = w_eps(t, sched)
            kind = sched.prediction_type
            if kind == "v":
                return w * ab_of(t, sched)
            if kind == "x0":
                return w * snr_of(t, sched)
            if kind == "flow":
                ab = ab_of(t, sched)
                return w * ab / jnp.square(jnp.sqrt(ab) + jnp.sqrt(1.0 - ab))
            return w

        return fn

    if name == "snr":
        return native(snr_of)
    if name == "p2":
        return native(lambda t, sched: 1.0 / (1.0 + snr_of(t, sched)))
    if name == "min_snr_5":
        return native(
            lambda t, sched: jnp.minimum(snr_of(t, sched), 5.0)
            / jnp.maximum(snr_of(t, sched), 1e-8)
        )
    raise ValueError(f"unknown loss weighting {name!r}")


def make_train_step(
    model: UNetDenoiser,
    sched: DiffusionSchedule,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
) -> Callable[[TrainState, jnp.ndarray], Tuple[TrainState, Metrics]]:
    """Build the jitted train step.  ``batch`` is (B, H, W, C) fp32 in
    [-1, 1]; with ``grad_accum_steps=k`` it is split into k microbatches
    (B divisible by k) and gradients are averaged — numerically the
    reference's loss/k + deferred step."""

    loss_fn = make_loss_fn(
        model, sched, weight_fn=resolve_weight_fn(cfg.loss_weighting),
        dropout_rng_impl=getattr(cfg, "dropout_rng_impl", "threefry"),
        cond_dropout=getattr(cfg, "cond_dropout", 0.1),
        superres_factor=getattr(cfg, "superres_factor", 0),
        cond_aug=getattr(cfg, "cond_aug", 0.0),
    )
    accum = max(1, int(cfg.grad_accum_steps))
    lr_schedule = make_lr_schedule(cfg)
    flat_tail = bool(getattr(cfg, "flat_step_tail", False))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Metrics]:
        rng_next, k_step = jax.random.split(state.rng)

        grad_fn = jax.value_and_grad(loss_fn)

        if accum == 1:
            # fast path: no scan wrapper around the single microbatch
            loss, grads = grad_fn(state.params, batch, k_step)
        else:
            B = jax.tree.leaves(batch)[0].shape[0]
            micro = jax.tree.map(
                lambda a: a.reshape(accum, B // accum, *a.shape[1:]), batch
            )
            keys = jax.random.split(k_step, accum)

            def body(carry, inp):
                loss_acc, g_acc = carry
                x, k = inp
                loss, g = grad_fn(state.params, x, k)
                g_acc = jax.tree.map(
                    lambda a, b: a + b.astype(jnp.float32), g_acc, g
                )
                return (loss_acc + loss, g_acc), None

            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (0.0, zero_g), (micro, keys)
            )
            loss = loss_sum / accum
            grads = jax.tree.map(lambda g: g / accum, grad_sum)

        if flat_tail:
            # one reduction over the raveled grads (the ravel CSEs with the
            # flat optimizer's own) instead of ~300 per-leaf reductions;
            # pre-clip semantics unchanged, value differs only by fp
            # reassociation
            from jax.flatten_util import ravel_pytree

            grad_norm = jnp.linalg.norm(ravel_pytree(grads)[0])
        else:
            grad_norm = optax.global_norm(grads)  # pre-clip, like the reference
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_decay,
                                flat=flat_tail)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            rng=rng_next,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "lr": lr_schedule(state.step),
        }
        return new_state, metrics

    return train_step


def make_eval_step(
    model: UNetDenoiser, sched: DiffusionSchedule,
    superres_factor: int = 0,
) -> Callable[[Any, jnp.ndarray, jax.Array], jnp.ndarray]:
    """(params, batch, key) -> scalar L_simple in eval mode (no dropout, no
    grads) — the validation pass the reference never runs despite building
    valid/test loaders (``load_data_from_torch.py:43-44``).  ``batch`` is
    images, or ``(images, labels)`` for conditional models (real labels,
    no NULL-token dropout — the conditional likelihood).  Deterministic
    in the key: driving it with a fixed per-batch-index key gives the same
    (t, noise) draws every eval pass, so epoch-over-epoch val losses
    compare without Monte-Carlo jitter."""
    num_classes = int(getattr(getattr(model, "config", None),
                              "num_classes", 0))
    sr_factor = _check_superres(getattr(model, "config", None),
                                superres_factor)

    @jax.jit
    def eval_step(params, batch, key: jax.Array) -> jnp.ndarray:
        x, y = _split_batch(batch, bool(num_classes))
        kt, kn = jax.random.split(key)
        t = sample_timesteps(kt, x.shape[0], sched.T)
        noise = jax.random.normal(kn, x.shape, dtype=jnp.float32)
        y_kw = {"y": jnp.asarray(y, jnp.int32)} if num_classes else {}
        cond_kw = {}
        if sr_factor:
            from ..ops.superres import build_cond

            cond_kw = {"x_cond": build_cond(x, sr_factor)}  # no aug in eval

        def eps_fn(x_t, tt):
            return model.apply(params, x_t, tt, deterministic=True,
                               **y_kw, **cond_kw)

        return loss_simple(sched, eps_fn, x, t, noise)

    return eval_step


def make_probe_fn(
    model: UNetDenoiser, sched: DiffusionSchedule,
    superres_factor: int = 0,
) -> Callable[[Any, jnp.ndarray, Tuple[int, ...], jax.Array], jnp.ndarray]:
    """Fixed-timestep loss probes: re-evaluate L_simple at chosen t values on
    the current batch (``train_one_epoch.py:134-142``), eval mode, one jitted
    program returning a (len(taus),) vector."""

    sr_factor = _check_superres(getattr(model, "config", None),
                                superres_factor)

    @functools.partial(jax.jit, static_argnames=("taus",))
    def probe(params, x: jnp.ndarray, taus: Tuple[int, ...], key: jax.Array) -> jnp.ndarray:
        cond_kw = {}
        if sr_factor:
            # probes on an SR model: condition on the batch's own low-res
            # view, same as the train loss (no aug — a fixed cond keeps the
            # probe comparable across epochs)
            from ..ops.superres import build_cond

            cond_kw = {"x_cond": build_cond(x, sr_factor)}

        def eps_fn(x_t, tt):
            return model.apply(params, x_t, tt, deterministic=True, **cond_kw)

        losses = []
        for i, tau in enumerate(taus):
            k = jax.random.fold_in(key, i)
            t = jnp.full((x.shape[0],), int(tau), dtype=jnp.int32)
            noise = jax.random.normal(k, x.shape, dtype=jnp.float32)
            losses.append(loss_simple(sched, eps_fn, x, t, noise))
        return jnp.stack(losses)

    return probe
