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

__all__ = ["TrainConfig", "TrainState", "make_lr_schedule", "make_optimizer", "init_train_state"]


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

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
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


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm (optional) -> AdamW(warmup schedule).

    The reference clips with ``torch.nn.utils.clip_grad_norm_``
    (``train_one_epoch.py:102-105``) then steps Adam/AdamW; identical order.
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
        )
    )
    return optax.chain(*parts)


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
