"""Checkpoint save/load/resume — Orbax-backed, sharding-aware.

TPU-native redesign of the reference's single-file ``torch.save`` dict
(``src/training_loops/chekpoints.py:4-25``): the train-state pytree (params,
optimizer state, EMA shadow, step, EMA decay, RNG key) is written as an Orbax
checkpoint directory — sharded arrays save/restore with their shardings
(array serialization overlaps internally; the call returns once the rename
is durable).  A ``meta.json`` sidecar
carries epoch/global_step plus the *configs* (diffusion / model / train), so
schedule tables — deliberately excluded, like the reference's non-persistent
buffers (``difussion_class.py:46-48``) — are rebuilt from config on load.

The resume-time override semantics (``main_train_loop.py:97-139``):
reset-optimizer, lr/weight-decay/EMA-decay overrides, and the EMA
health-check-and-repair gate, are implemented in :func:`apply_resume_overrides`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .ema import ema_health, ema_reinit_from_params
from .state import TrainState

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "apply_resume_overrides",
    "mirror_checkpoint",
]

_checkpointer = None


def _get_checkpointer():
    # One AsyncCheckpointer for everything: orbax's "sync" Checkpointer
    # finalizes (tmp-dir -> final rename) on a background thread with no
    # wait handle, so the async variant + explicit wait is the only way to
    # know the checkpoint is durable before writing the meta sidecar.
    import orbax.checkpoint as ocp

    global _checkpointer
    if _checkpointer is None:
        _checkpointer = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _checkpointer


def _state_to_saveable(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "ema_decay": state.ema_decay,
        # typed PRNG keys are stored as raw key data
        "rng_data": jax.random.key_data(state.rng),
    }


def save_checkpoint(
    path: str,
    state: TrainState,
    *,
    epoch: int = 0,
    extra: Optional[Dict[str, Any]] = None,
    configs: Optional[Dict[str, Any]] = None,
) -> str:
    """Write the checkpoint directory at ``path`` (replaced if existing).

    ``extra`` mirrors the reference's extra dict ({"epoch", "global_step"},
    ``chekpoints.py:5-13``); ``configs`` holds to_dict()'d configs.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _get_checkpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, args=ocp.args.StandardSave(_state_to_saveable(state)))
    # the array write itself overlapped with compute; wait for the atomic
    # rename so the meta sidecar lands inside a durable directory
    ckptr.wait_until_finished()
    meta = {
        "epoch": int(epoch),
        "global_step": int(state.step),
        "extra": extra or {},
        "configs": configs or {},
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_checkpoint(
    path: str,
    template: TrainState,
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a state matching ``template``'s structure/shapes/shardings.

    Returns (state, meta).  The caller provides a freshly-initialized
    template (same configs) — the schedule-tables-from-config contract.
    """
    path = os.path.abspath(path)
    ckptr = _get_checkpointer()
    target = _state_to_saveable(template)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        target,
    )
    import orbax.checkpoint as ocp

    restored = ckptr.restore(path, args=ocp.args.StandardRestore(abstract))
    state = template.replace(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=restored["ema_params"],
        ema_decay=jnp.asarray(restored["ema_decay"], jnp.float32),
        rng=jax.random.wrap_key_data(restored["rng_data"]),
    )
    meta_path = os.path.join(path, "meta.json")
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def _fast_forward_schedule_counts(opt_state, step):
    """Set every ScaleByScheduleState.count (the LR-schedule clock) to
    ``step`` while leaving Adam's bias-correction count at zero."""
    import optax

    def fix(node):
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(step, jnp.int32)
            )
        return node

    return jax.tree.map(
        fix,
        opt_state,
        is_leaf=lambda n: isinstance(n, optax.ScaleByScheduleState),
    )


def apply_resume_overrides(
    state: TrainState,
    template: TrainState,
    *,
    reset_optimizer_state: bool = False,
    override_ema_decay: Optional[float] = None,
    repair_ema: bool = False,
    ema_decay_after_repair: float = 0.9995,
    ema_rel_tol: float = 5.0,
    log=print,
) -> TrainState:
    """Resume-time control knobs with the reference's exact semantics
    (``main_train_loop.py:97-139``).  LR / weight-decay overrides are
    handled by rebuilding the optimizer from an updated TrainConfig (they are
    schedule inputs here, not state) — see ``loop.train_ddpm``.
    """
    if reset_optimizer_state:
        # Fresh moments (like the reference's new torch optimizer), but the
        # LR warmup schedule must keep following the GLOBAL step — the
        # reference drives warmup off global_step (train_one_epoch.py:86-89),
        # so a mid-run reset must not re-ramp the learning rate.
        fresh = _fast_forward_schedule_counts(template.opt_state, state.step)
        state = state.replace(opt_state=fresh)
        log("[RESUME] optimizer state reset (not loaded); warmup continues from global step.")
    if override_ema_decay is not None:
        state = state.replace(
            ema_decay=jnp.asarray(float(override_ema_decay), jnp.float32)
        )
        log(f"[RESUME] override_ema_decay -> {override_ema_decay:.6f}")
    if repair_ema:
        ok, reason, rel = ema_health(state.ema_params, state.params, rel_tol=ema_rel_tol)
        if not ok:
            state = state.replace(
                ema_params=ema_reinit_from_params(state.params),
                ema_decay=jnp.asarray(float(ema_decay_after_repair), jnp.float32),
            )
            log(
                f"[RESUME][EMA][AUTO] checkpoint EMA invalid ({reason}, rel={rel:.3f})."
                f" Reinitialized | decay={ema_decay_after_repair:.6f}"
            )
        else:
            log(f"[RESUME][EMA][AUTO] checkpoint EMA healthy (rel={rel:.3f}). Kept.")
    return state


def mirror_checkpoint(src_path: str, mirror_dir: str, fixed_name: str = "latest_ddpm") -> Optional[str]:
    """Copy a checkpoint directory to a mirror location under a fixed name,
    replacing any previous copy — the reference's Drive mirror
    (``main_train_loop.py:30-45``) generalized to any mounted path."""
    import shutil

    if not mirror_dir:
        return None
    try:
        os.makedirs(mirror_dir, exist_ok=True)
        dst = os.path.join(mirror_dir, fixed_name)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src_path, dst)
        return dst
    except Exception as e:  # mirror failures must never kill training
        print(f"[MIRROR] copy failed: {e}")
        return None
