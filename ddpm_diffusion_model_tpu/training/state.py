"""Train state pytree + optimizer construction.

TPU-native redesign of the reference's mutable runtime (optimizer
``param_groups`` surgery for warmup/overrides, ``train_one_epoch.py:86-89``
and ``main_train_loop.py:117-129``; GradScaler, ``grad_scaler.py``): one
immutable :class:`TrainState` pytree threaded through a compiled step.

- LR warmup is an optax schedule (lr = base_lr * min(1, (count+1)/warmup),
  the reference's exact ramp, ``training_utils.py:108-114``) — no mutation.
- No GradScaler: params/optimizer are fp32, compute is bf16 (the reference
  itself recommends bf16-without-scaler, ``grad_scaler.py`` docstring path).
- ``ema_decay`` is a *runtime scalar inside the state* so resume-time
  ``override_ema_decay`` (``main_train_loop.py:126-129``) is a state update,
  not a recompile.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .ema import ema_init

__all__ = ["TrainConfig", "TrainState", "make_lr_schedule", "flatten_optimizer",
           "make_optimizer", "init_train_state"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization knobs (the reference's ``train_ddpm`` kwargs distilled,
    ``main_train_loop.py:48-83``)."""

    base_lr: float = 2e-4
    warmup_steps: Optional[int] = 1000
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    grad_clip: Optional[float] = 1.0
    grad_accum_steps: int = 1
    ema_decay: float = 0.9995
    # per-timestep loss re-weighting: None|"uniform"|"snr"|"p2"|"min_snr_5"
    # (the reference's loss_simple weight arg, promoted to a config knob)
    loss_weighting: Optional[str] = None
    # run clip+AdamW on ONE raveled fp32 vector instead of ~300 small leaves
    # (each leaf costs per-op dispatch overhead on TPU; see docs/BENCH.md
    # "optimizer tail").  Numerically identical up to fp reassociation of the
    # global norm.  opt_state layout changes; resume rebuilds tx from this
    # config, so checkpoints are self-consistent either way.
    flat_optimizer: bool = True
    # PRNG family for dropout masks: "rbg" uses the TPU hardware generator
    # (~3x faster than threefry for the ~560M bernoulli draws/step of the
    # 64px config); masks are decorrelated noise either way, training
    # semantics are unchanged.  "threefry" keeps the JAX default.
    dropout_rng_impl: str = "rbg"
    # store Adam's first moment in a narrower dtype ("bfloat16"): -25% of the
    # optimizer state's HBM footprint and tail traffic.  The second moment
    # stays fp32 (its dynamic range drives the update's denominator).  None
    # keeps full fp32 moments — the default; opt in for memory-bound scale.
    moment_dtype: Optional[str] = None
    # classifier-free guidance training (conditional models only): fraction
    # of samples whose label is replaced by the NULL token each step, so one
    # network learns both eps(x,t,y) and eps(x,t) (Ho & Salimans 2022).
    # Ignored when the model is unconditional (num_classes == 0).
    cond_dropout: float = 0.1
    # super-resolution training (SR3 / cascaded diffusion, ops/superres.py):
    # factor >= 2 turns the loss into conditional upsampling — each batch's
    # own antialiased /factor view (bilinearly resized back to the grid) is
    # fed as x_cond, so the model must have cond_channels == in_channels.
    # 0 = normal unconditional/class-conditional training.
    superres_factor: int = 0
    # Gaussian conditioning augmentation for SR training: per-sample
    # sigma ~ U[0, cond_aug] noise on x_cond (CDM §3.2), teaching the
    # upsampler robustness to the base model's imperfect samples.
    cond_aug: float = 0.0
    # run the step tail's EMA lerp and grad-norm metric on one raveled
    # vector instead of ~300 leaf kernels — the flat_optimizer treatment
    # extended to the rest of the step.  MEASURED SLOWER on the v5e
    # (1073 vs 1106 imgs/s, reproduced twice: unlike the optimizer — whose
    # m/v state lives flat persistently — the EMA/grad trees must be
    # re-raveled every step, and those 125 MB concat materializations cost
    # more than the ~300 launches they replace; docs/BENCH.md "step tail").
    # Kept as an option for models with far more leaves.  EMA is bit-exact
    # under raveling; the grad-norm METRIC differs only by fp reassociation.
    flat_step_tail: bool = False

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict, *, legacy: bool = False) -> "TrainConfig":
        """``legacy=True`` is for checkpoint metas written before the r2
        perf knobs existed: those runs used the tree optimizer and threefry
        dropout, and restoring them needs the matching opt_state structure.
        Fresh user config files (legacy=False) get the modern defaults."""
        d = dict(d)
        if legacy:
            d.setdefault("flat_optimizer", False)
            d.setdefault("dropout_rng_impl", "threefry")
            d.setdefault("flat_step_tail", False)
        return cls(**d)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray          # global optimizer step (int32 scalar)
    params: Any
    opt_state: Any
    ema_params: Any
    ema_decay: jnp.ndarray     # f32 scalar, runtime-overridable
    rng: jax.Array             # PRNG key, split every step


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Linear warmup to base_lr then constant (``training_utils.py:108-114``)."""
    base = cfg.base_lr
    warmup = cfg.warmup_steps

    def schedule(count):
        if not warmup or warmup <= 0:
            return jnp.asarray(base, jnp.float32)
        return base * jnp.minimum(1.0, (count + 1) / warmup)

    return schedule


def flatten_optimizer(
    tx: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Run ``tx`` over ONE raveled vector instead of the parameter pytree.

    The U-Net's ~300 small parameter leaves make the optimizer tail
    dispatch-bound on TPU: every optax stage (clip scale, m, v, update, wd,
    apply) emits one fused kernel PER LEAF.  Raveling turns that into a
    handful of kernels over one contiguous fp32 vector; only the final
    ``unravel`` (one slice+reshape per leaf) remains per-leaf work.

    Numerics: identical to the tree version up to float reassociation —
    ``global_norm``/Adam moments/weight decay are all elementwise or
    whole-tree reductions with no per-leaf semantics (no masking is used
    anywhere in this framework's optimizers).

    The vector is zero-padded to a multiple of 8192 so the optimizer-state
    leaves stay FSDP-shardable (``fsdp_leaf_spec`` needs divisibility by the
    mesh axis; a raw param count is usually odd).  Padded grads are zero, so
    moments/updates on the pad stay exactly zero and the global norm is
    unchanged.
    """
    from jax.flatten_util import ravel_pytree

    _MULTIPLE = 8192

    def _pad(flat):
        n = flat.shape[0]
        rem = (-n) % _MULTIPLE
        return jnp.pad(flat, (0, rem)) if rem else flat

    def init(params):
        flat, _ = ravel_pytree(params)
        return tx.init(_pad(flat))

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        n = flat_g.shape[0]
        flat_p = _pad(ravel_pytree(params)[0]) if params is not None else None
        flat_u, state = tx.update(_pad(flat_g), state, flat_p)
        return unravel(flat_u[:n]), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm (optional) -> AdamW(warmup schedule).

    The reference clips with ``torch.nn.utils.clip_grad_norm_``
    (``train_one_epoch.py:102-105``) then steps Adam/AdamW; identical order.
    With ``cfg.flat_optimizer`` the chain runs on one raveled vector (see
    :func:`flatten_optimizer`).
    """
    parts = []
    if cfg.grad_clip is not None:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    parts.append(
        optax.adamw(
            learning_rate=make_lr_schedule(cfg),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            weight_decay=cfg.weight_decay,
            mu_dtype=cfg.moment_dtype,
        )
    )
    tx = optax.chain(*parts)
    return flatten_optimizer(tx) if cfg.flat_optimizer else tx


def init_train_state(
    params: Any,
    cfg: TrainConfig,
    seed: int = 0,
    tx: Optional[optax.GradientTransformation] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Fresh state (step 0, EMA = params copy).

    Params are deep-copied into the state: the train step donates the whole
    state, and donating the caller's own param buffers would silently delete
    them out from under the caller."""
    tx = tx if tx is not None else make_optimizer(cfg)
    params = jax.tree.map(lambda p: jnp.asarray(p).copy(), params)
    return (
        TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=ema_init(params),
            ema_decay=jnp.asarray(cfg.ema_decay, jnp.float32),
            rng=jax.random.key(seed),
        ),
        tx,
    )
