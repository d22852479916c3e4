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
import threading
from typing import Any, Dict, Literal, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .ema import ema_health, ema_reinit_from_params
from .state import TrainState

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "read_meta",
    "wait_for_checkpoints",
    "apply_resume_overrides",
    "mirror_checkpoint",
    "find_latest_checkpoint",
]

_checkpointer = None
_pending_finalize: Optional[threading.Thread] = None
_finalize_error: Optional[BaseException] = None


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


def read_meta(path: str, *, strict: bool = False) -> Optional[Dict[str, Any]]:
    """Read a checkpoint directory's ``meta.json`` sidecar.

    The single parser for every consumer (resume reconciliation, CLI config
    recovery, latest-checkpoint resolution) so the sidecar format lives in
    one place.  Returns ``None`` when the sidecar is missing — or unreadable
    with ``strict=False``; ``strict=True`` propagates parse errors (a
    present-but-corrupt sidecar on an explicit load should fail loudly
    rather than silently dropping the saved configs)."""
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        return None
    try:
        with open(meta_path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        if strict:
            raise
        return None


def _finalize_save(path: str, meta: Dict[str, Any],
                   mirror_dir: Optional[str], fixed_mirror_name: str,
                   log=None) -> None:
    """Wait for the async array write + atomic rename, then land the meta
    sidecar inside the durable directory (and mirror, if asked).

    Multi-process runs: every process waits (orbax's own finalize barrier),
    but only process 0 writes the meta sidecar / mirror — the checkpoint
    directory is on a shared filesystem and concurrent identical writes
    would race."""
    _get_checkpointer().wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        if mirror_dir:
            dst = mirror_checkpoint(path, mirror_dir, fixed_mirror_name)
            if dst and log:
                log(f"└─ [MIRROR] copied -> {dst}")
    if jax.process_count() > 1:
        # non-primary processes must not observe the directory before the
        # meta sidecar lands (load_checkpoint reads it unconditionally)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_meta:{path}")


def save_checkpoint(
    path: str,
    state: TrainState,
    *,
    epoch: int = 0,
    extra: Optional[Dict[str, Any]] = None,
    configs: Optional[Dict[str, Any]] = None,
    block: bool = True,
    mirror_dir: Optional[str] = None,
    fixed_mirror_name: str = "latest_ddpm",
    log=None,
) -> str:
    """Write the checkpoint directory at ``path`` (replaced if existing).

    ``extra`` mirrors the reference's extra dict ({"epoch", "global_step"},
    ``chekpoints.py:5-13``); ``configs`` holds to_dict()'d configs.

    With ``block=False`` the call returns as soon as the device->host copy is
    staged (orbax copies synchronously, so later donated-buffer reuse by the
    train step is safe) and disk serialization + the meta sidecar + the
    optional mirror copy overlap the next epoch's compute on a background
    thread.  Call :func:`wait_for_checkpoints` (or any later save/load, which
    drain first) before reading the directory.  In multi-process runs
    ``block=False`` is ignored (the finalize barrier is a collective and must
    run on the main thread, ordered with the train-step collectives).
    """
    import orbax.checkpoint as ocp

    global _pending_finalize
    path = os.path.abspath(path)
    wait_for_checkpoints()  # drain any in-flight save before starting a new one
    ckptr = _get_checkpointer()
    if jax.process_index() == 0 and os.path.exists(path):
        # only the primary clears an existing directory — concurrent rmtree
        # of the same shared path races (scandir hits entries the other
        # process already unlinked)
        import shutil

        shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_rm:{path}")
    ckptr.save(path, args=ocp.args.StandardSave(_state_to_saveable(state)))
    meta = {
        "epoch": int(epoch),
        "global_step": int(state.step),
        "extra": extra or {},
        "configs": configs or {},
    }
    if jax.process_count() > 1:
        # _finalize_save ends in a cross-process barrier collective; issuing
        # it from the background thread would let it interleave in a
        # different order than the main thread's train-step collectives on
        # each process (process 0 enqueues [step, barrier], process 1
        # [barrier, step]) and hang the pod.  Multi-process saves therefore
        # always block; async overlap remains a single-process optimization.
        block = True
    if block:
        _finalize_save(path, meta, mirror_dir, fixed_mirror_name, log)
    else:
        _pending_finalize = threading.Thread(
            target=_finalize_guarded,
            args=(path, meta, mirror_dir, fixed_mirror_name, log),
            daemon=True,
        )
        _pending_finalize.start()
    return path


def _finalize_guarded(*args) -> None:
    """Thread target: stash finalize failures for re-raise on the main
    thread — a dead daemon thread otherwise turns a failed save (disk
    full, write error) into a silent success, and resume later restores
    an older checkpoint with no indication why."""
    global _finalize_error
    try:
        _finalize_save(*args)
    except BaseException as e:  # noqa: BLE001 — must not vanish with the thread
        _finalize_error = e


def wait_for_checkpoints() -> None:
    """Block until every previously dispatched async save is durable on disk
    (array dirs renamed, meta sidecars written, mirrors copied).  Raises if
    a background finalize failed."""
    global _pending_finalize, _finalize_error
    if _pending_finalize is not None:
        _pending_finalize.join()
        _pending_finalize = None
    if _finalize_error is not None:
        err, _finalize_error = _finalize_error, None
        raise RuntimeError("async checkpoint finalize failed") from err
    if _checkpointer is not None:
        _checkpointer.wait_until_finished()


_COMPONENTS = ("params", "opt_state", "ema_params", "step", "ema_decay", "rng")


def load_checkpoint(
    path: str,
    template: TrainState,
    components: Optional[Sequence[str]] = None,
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a state matching ``template``'s structure/shapes/shardings.

    Returns (state, meta).  The caller provides a freshly-initialized
    template (same configs) — the schedule-tables-from-config contract.

    ``components`` selects what to restore, mirroring the reference's
    restore-each-iff-passed semantics (``chekpoints.py:16-25``): e.g.
    ``("params", "ema_params")`` is a params-only fine-tuning load that
    keeps the template's fresh optimizer state, step counter and RNG.
    Unselected components are never read from disk, so their saved
    shapes/structure may differ from the template (optimizer swaps).
    ``None`` restores everything.
    """
    path = os.path.abspath(path)
    wait_for_checkpoints()
    ckptr = _get_checkpointer()
    sel = _COMPONENTS if components is None else tuple(components)
    unknown = set(sel) - set(_COMPONENTS)
    if unknown:
        raise ValueError(f"unknown checkpoint components: {sorted(unknown)}")
    target = _state_to_saveable(template)
    abstract = {
        k: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            v,
        )
        for k, v in target.items()
        if (k if k != "rng_data" else "rng") in sel
    }
    import orbax.checkpoint as ocp

    if components is None:
        restored = ckptr.restore(path, args=ocp.args.StandardRestore(abstract))
    else:
        # subset loads go through PyTreeRestore(partial_restore=True) — the
        # unselected subtrees are never deserialized, so a checkpoint saved
        # with a different optimizer still params-only-loads cleanly
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as pt:
            restored = pt.restore(
                path, args=ocp.args.PyTreeRestore(abstract, partial_restore=True)
            )
    repl: Dict[str, Any] = {}
    if "step" in sel:
        repl["step"] = jnp.asarray(restored["step"], jnp.int32)
    if "params" in sel:
        repl["params"] = restored["params"]
    if "opt_state" in sel:
        repl["opt_state"] = restored["opt_state"]
    if "ema_params" in sel:
        repl["ema_params"] = restored["ema_params"]
    if "ema_decay" in sel:
        repl["ema_decay"] = jnp.asarray(restored["ema_decay"], jnp.float32)
    if "rng" in sel:
        repl["rng"] = jax.random.wrap_key_data(restored["rng_data"])
    state = template.replace(**repl)
    meta = read_meta(path, strict=True) or {}
    return state, meta


def _fast_forward_schedule_counts(opt_state, step):
    """Set every ScaleByScheduleState.count (the LR-schedule clock) to
    ``step`` while leaving Adam's bias-correction count at zero."""
    import optax

    def fix(node):
        if isinstance(node, optax.ScaleByScheduleState):
            # copy=True: asarray of an int32 step returns the SAME array,
            # and count aliasing state.step makes the donated train step
            # donate one buffer twice (XLA INVALID_ARGUMENT)
            return optax.ScaleByScheduleState(
                count=jnp.array(step, dtype=jnp.int32, copy=True)
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
    repair_ema: Union[bool, Literal["force"]] = False,
    ema_decay_after_repair: Optional[float] = None,
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
        # True/"auto": reference semantics — repair only when the health
        # check fails.  "force": unconditional re-seed from the model —
        # the recovery for a healthy-but-LAGGING shadow (e.g. a short run
        # whose decay time constant exceeds the steps taken), which the
        # auto gate would keep.  Force skips the whole-tree health check
        # (per-leaf device reductions) since its result would be discarded.
        if repair_ema == "force":
            ok, reason, rel = False, "forced", float("nan")
        else:
            ok, reason, rel = ema_health(
                state.ema_params, state.params, rel_tol=ema_rel_tol)
        if repair_ema == "force" or not ok:
            # post-repair decay precedence: explicit ema_decay_after_repair >
            # override_ema_decay (an explicit override must survive the
            # repair, not be clobbered by a default) > 0.9995
            decay_after = (
                ema_decay_after_repair if ema_decay_after_repair is not None
                else (override_ema_decay if override_ema_decay is not None
                      else 0.9995))
            state = state.replace(
                ema_params=ema_reinit_from_params(state.params),
                ema_decay=jnp.asarray(float(decay_after), jnp.float32),
            )
            why = "forced" if repair_ema == "force" else f"invalid ({reason}, rel={rel:.3f})"
            log(
                f"[RESUME][EMA][AUTO] checkpoint EMA {why}."
                f" Reinitialized | decay={decay_after:.6f}"
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


def find_latest_checkpoint(ckpt_dir: str, run_name: str) -> Optional[str]:
    """Most-recent checkpoint of ``run_name`` under ``ckpt_dir`` by
    ``global_step`` in each ``meta.json`` (epoch as tiebreak) — the resolver
    behind ``train_ddpm(resume_path="auto")``.  Considers the periodic
    ``<run>_eNNN``, the final ``<run>_last``, and the emergency
    ``<run>_preempt`` saves; returns None when nothing restorable exists."""
    import glob

    best, best_key = None, (-1, -1)
    candidates = (
        glob.glob(os.path.join(ckpt_dir, f"{run_name}_e[0-9]*"))
        + [os.path.join(ckpt_dir, f"{run_name}_last"),
           os.path.join(ckpt_dir, f"{run_name}_preempt")]
    )
    for path in candidates:
        meta = read_meta(path)
        if meta is None:
            continue
        key = (int(meta.get("global_step", -1)), int(meta.get("epoch", -1)))
        if key > best_key:
            best, best_key = path, key
    return best
