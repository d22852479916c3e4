"""Epoch driver: the host-side orchestration around the compiled step.

Capability parity with ``src/training_loops/main_train_loop.py:48-231`` and
``train_one_epoch.py:11-168`` — resume (+overrides +EMA repair), the
box-drawing log tables with the same columns, per-step diagnostics (loss,
lr, dt(ms), grad-norm, memory, fixed-t probe losses), periodic EMA-gated
sampling with a fixed seed for cross-epoch comparability, periodic
checkpointing with a mirror copy, and a final "last" checkpoint.

What changed TPU-side: the inner loop is a single jitted step (bf16 +
grad-accum scan + EMA inside); metrics come back as a small device pytree
fetched once per step; sampling swaps no weights (EMA params are passed
directly); there is no GradScaler and no OOM-skip (static XLA memory; use
``remat`` for big configs).
"""

from __future__ import annotations

import json
import os
import time
from typing import (Any, Callable, Dict, Iterable, Literal, Optional,
                    Sequence, Tuple, Union)

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import UNetDenoiser
from ..ops.schedules import DiffusionSchedule
from .checkpoint import (
    apply_resume_overrides,
    load_checkpoint,
    read_meta,
    save_checkpoint,
    wait_for_checkpoints,
)
from .diagnostics import StepTimer, device_mem_mb, fmt_hms, rule
from .ema import ema_health
from .state import TrainConfig, TrainState, init_train_state, make_optimizer
from .step import make_eval_step, make_probe_fn, make_train_step

__all__ = ["train_ddpm", "train_one_epoch"]


def _as_batch_array(batch):
    """Accept (x, label) tuples (reference loader protocol,
    ``train_one_epoch.py:61``) or bare arrays; NHWC float32 out.

    Device-resident batches (``DeviceCacheLoader``) pass through untouched
    — ``np.asarray`` on them would pull the data back to the host, undoing
    the point of the cache."""
    if isinstance(batch, (tuple, list)):
        batch = batch[0]
    if isinstance(batch, jax.Array):
        if batch.ndim != 4:
            raise ValueError(f"expected batched images, got {batch.shape}")
        return batch
    x = np.asarray(batch, dtype=np.float32)
    if x.ndim != 4:
        raise ValueError(f"expected batched images, got shape {x.shape}")
    if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        x = np.transpose(x, (0, 2, 3, 1))  # tolerate NCHW sources
    return x


def _saved_train_config(ckpt_path: str) -> Optional[TrainConfig]:
    """Best-effort read of the TrainConfig a checkpoint was written with
    (from its ``meta.json`` sidecar), legacy-defaulted so pre-knob metas
    resolve to the structures those runs actually used."""
    meta = read_meta(ckpt_path)
    if meta is None:
        return None
    configs = meta.get("configs") or {}
    tc = (configs.get("experiment") or {}).get("train") or configs.get("train")
    if not isinstance(tc, dict):
        return None
    try:
        return TrainConfig.from_dict(tc, legacy=True)
    except TypeError:
        return None


def _batch_labels(batch):
    """Labels from a loader item, for conditional training: requires the
    ``(images, labels)`` protocol (every loader in ``data/`` follows it).
    Device-resident labels (``DeviceCacheLoader(labels=...)``) pass through
    untouched — pulling them to host would undo the cache."""
    if (not (isinstance(batch, (tuple, list)) and len(batch) >= 2)
            or batch[1] is None):
        raise ValueError(
            "conditional model (num_classes > 0) needs (images, labels) "
            "batches; this loader yields no labels (pass labels= / a "
            "labeled dataset to DeviceCacheLoader, or use DataLoader over "
            "a labeled dataset)")
    if isinstance(batch[1], jax.Array):
        if batch[1].ndim != 1:
            raise ValueError(f"expected (B,) labels, got {batch[1].shape}")
        return batch[1]
    y = np.asarray(batch[1], dtype=np.int32)
    if y.ndim != 1:
        raise ValueError(f"expected (B,) integer labels, got {y.shape}")
    return y


def train_one_epoch(
    train_step,
    state: TrainState,
    dataloader: Iterable,
    *,
    batch_sharding=None,
    labeled: bool = False,
    label_sharding=None,
    max_batches: Optional[int] = None,
    log_every: int = 0,
    probe_fn=None,
    probe_timesteps: Optional[Sequence[int]] = None,
    log_mem: bool = False,
    log_grad_norm: bool = False,
    epoch_header_printed: list = None,
    stop_flag=None,
) -> Tuple[TrainState, float, int, int]:
    """One pass over the loader.  Returns (state, avg_loss, n_batches, n_images)."""
    n_batches, n_images = 0, 0
    loss_acc = None  # accumulated ON DEVICE; fetched once per epoch — the
    #                  per-step .item() sync the reference pays is the exact
    #                  pipeline stall we avoid (steps stay async between logs)
    step0 = int(jax.device_get(state.step))
    timer = StepTimer()

    # baseline sanity print at step 0 — computed on the first DEVICE batch
    # (below), not pre-loop: the zero-predictor L_simple is MSE(0, eps) =
    # mean(eps^2) for batch-shaped device noise, the reference's semantics
    # (train_one_epoch.py:48-52 computes (randn(32,3,s,s)**2).mean() on device)
    baseline_pending = bool(
        log_every
        and step0 == 0
        and epoch_header_printed is not None
        and not epoch_header_printed[0]
    )
    title_printed = False

    def _host_batches():
        for i, batch in enumerate(dataloader):
            if max_batches is not None and i >= max_batches:
                return
            if labeled:
                yield _as_batch_array(batch), _batch_labels(batch)
            else:
                yield _as_batch_array(batch)

    from ..data.loader import device_prefetch

    for x_dev, y_dev in device_prefetch(
        _host_batches(), size=2, sharding=batch_sharding,
        put_labels=labeled, label_sharding=label_sharding,
    ):
        if stop_flag:  # preemption: stop at a batch boundary, state intact
            break
        x_shape0 = x_dev.shape[0]
        if baseline_pending:
            baseline_pending = False
            title_printed = True
            eps = jax.random.normal(jax.random.key(0), x_dev.shape, jnp.float32)
            base = float(jax.device_get(jnp.mean(jnp.square(eps))))
            print("┆ In-epoch statistics")
            print(f"┆   (baseline)  eps-MSE ~ {base:.3f}  (expected ~1.0)")
        timer.reset()
        state, metrics = train_step(
            state, (x_dev, y_dev) if labeled else x_dev)

        loss_acc = metrics["loss"] if loss_acc is None else loss_acc + metrics["loss"]
        n_batches += 1
        n_images += x_shape0
        step_now = step0 + n_batches  # train_step advances exactly once

        if log_every and (step_now % log_every == 0):
            loss_val = float(jax.device_get(metrics["loss"]))
            dt_ms = timer.mark(metrics["loss"])
            if epoch_header_printed is not None and not epoch_header_printed[0]:
                if not title_printed:
                    print("┆ In-epoch statistics")
                print(
                    "┆   {:>8} | {:>9} | {:>8} | {:>8} | {:>10}{}".format(
                        "step", "lr", "loss", "dt(ms)", "grad_norm",
                        " | probes[t]" if probe_timesteps else "",
                    )
                )
                print("┆   " + "─" * 72)
                epoch_header_printed[0] = True

            gn_str = (
                f"{float(jax.device_get(metrics['grad_norm'])):.2e}"
                if log_grad_norm
                else "—"
            )
            probe_msg = ""
            if probe_fn is not None and probe_timesteps:
                vals = np.asarray(
                    jax.device_get(
                        probe_fn(
                            state.params,
                            x_dev,
                            tuple(int(t) for t in probe_timesteps),
                            jax.random.fold_in(jax.random.key(0), step_now),
                        )
                    )
                )
                probe_msg = " | " + " ".join(
                    f"t={tau}:{v:.3f}" for tau, v in zip(probe_timesteps, vals)
                )
            mem_msg = ""
            if log_mem:
                used, peak = device_mem_mb()
                mem_msg = f" | mem={used:.0f}/{peak:.0f}MB"

            lr_now = float(jax.device_get(metrics["lr"]))
            print(
                "┆   {:8d} | {:9.2e} | {:8.4f} | {:8.1f} | {:>10}{}{}".format(
                    step_now, lr_now, loss_val, dt_ms, gn_str, mem_msg, probe_msg
                )
            )

    avg_loss = (
        float(jax.device_get(loss_acc)) / n_batches if n_batches else 0.0
    )
    return state, avg_loss, n_batches, n_images


def evaluate_loss(
    eval_step,
    params,
    dataloader: Iterable,
    *,
    batch_sharding=None,
    labeled: bool = False,
    max_batches: Optional[int] = None,
    seed: int = 42,
) -> float:
    """Mean eval-mode L_simple over a loader.  Per-batch keys are fixed
    (fold_in of ``seed`` by batch index), so repeated calls — across epochs
    or between raw and EMA params — see identical (t, noise) draws and
    differ only through the parameters.  ``labeled=True`` (conditional
    models) feeds the loader's real labels to the eval step."""
    loss_acc, n = None, 0
    base = jax.random.key(seed)
    for i, batch in enumerate(dataloader):
        if max_batches is not None and i >= max_batches:
            break
        x = jnp.asarray(_as_batch_array(batch))
        if batch_sharding is not None:
            x = jax.device_put(x, batch_sharding)
        b = (x, jnp.asarray(_batch_labels(batch))) if labeled else x
        loss = eval_step(params, b, jax.random.fold_in(base, i))
        loss_acc = loss if loss_acc is None else loss_acc + loss
        n += 1
    return float(jax.device_get(loss_acc)) / n if n else float("nan")


def train_ddpm(
    model: UNetDenoiser,
    sched: DiffusionSchedule,
    train_loader: Iterable,
    *,
    train_config: Optional[TrainConfig] = None,
    init_params=None,
    init_seed: int = 0,
    epochs: int = 50,
    max_batches: Optional[int] = None,
    # sampling hooks
    sample_every: int = 5,
    sample_n: int = 36,
    img_size: int = 64,
    sample_fn: Optional[Callable] = None,
    sample_seed: Optional[int] = 1234,
    fid_reference: Optional[np.ndarray] = None,
    fid_extractor: Optional[str] = None,
    # validation hooks (beyond the reference, which builds valid loaders but
    # never evaluates them — load_data_from_torch.py:43-44)
    eval_loader: Optional[Iterable] = None,
    eval_every: int = 1,
    eval_max_batches: Optional[int] = None,
    # checkpoint hooks
    ckpt_dir: str = "checkpoints",
    run_name: str = "ddpm",
    save_every: int = 5,
    save_last: bool = True,
    resume_path: Optional[str] = None,
    mirror_dir: Optional[str] = None,
    fixed_mirror_name: str = "latest_ddpm",
    # diagnostics
    log_every: int = 0,
    probe_timesteps: Optional[Sequence[int]] = None,
    log_mem: bool = False,
    log_grad_norm: bool = False,
    # resume-time control (reference: main_train_loop.py:69-77)
    reset_optimizer_state: bool = False,
    override_lr: Optional[float] = None,
    override_weight_decay: Optional[float] = None,
    override_ema_decay: Optional[float] = None,
    repair_ema_on_resume: Union[bool, Literal["force"]] = False,
    ema_decay_after_repair: Optional[float] = None,
    resume_components: Optional[Sequence[str]] = None,
    configs_for_ckpt: Optional[Dict[str, Any]] = None,
    # multi-chip (the layer the reference never had, SURVEY.md §2.6)
    mesh=None,
    fsdp: bool = False,
    metrics_jsonl: Optional[str] = "auto",
    handle_preemption: bool = True,
) -> Tuple[TrainState, Dict[str, Any]]:
    """Full training run.  Returns (final_state, summary).

    ``mesh``: a ``jax.sharding.Mesh`` (e.g. ``parallel.make_mesh()``) turns
    the run data-parallel — the state is placed replicated (or FSDP-sharded
    with ``fsdp=True``), every batch is device_put with DP sharding, and XLA
    emits the gradient collectives over ICI.  Single-chip behavior is
    unchanged when ``mesh`` is None.

    ``metrics_jsonl``: machine-readable run log — one JSON line per epoch
    (epoch, global_step, loss, lr, imgs/s, seconds, rFID when scored),
    appended as the run progresses so dashboards can tail it.  ``"auto"``
    (default) writes ``<ckpt_dir>/<run_name>_metrics.jsonl``; a path
    overrides; ``None`` disables.  (The reference only has its stdout
    table, ``train_one_epoch.py:124-155``.)

    ``eval_loader`` must be RE-ITERABLE (a loader/dataset object, not a
    one-shot generator): each eval epoch iterates it twice — raw params,
    then EMA params on identical (t, noise) draws.  A one-shot iterator is
    detected (the second pass yields nothing) and warned about.

    ``handle_preemption``: catch SIGTERM/SIGINT at batch boundaries, save an
    emergency ``<run_name>_preempt`` checkpoint, and return early with
    ``summary["preempted"] = True`` (see ``training/preemption.py``).
    ``resume_path="auto"`` resolves to the newest restorable checkpoint of
    this run in ``ckpt_dir`` (periodic / last / preempt), so a relaunch
    after preemption is just the same command again."""
    cfg = train_config or TrainConfig()
    os.makedirs(ckpt_dir, exist_ok=True)

    # Resolve the resume target FIRST: the overrides below are RESUME-time
    # semantics (main_train_loop.py:69-77) and must not silently apply to a
    # fresh run (e.g. --resume auto finding nothing in a wrong ckpt-dir).
    if resume_path == "auto":
        from .checkpoint import find_latest_checkpoint

        resume_path = find_latest_checkpoint(ckpt_dir, run_name)
        print(f"[RESUME] auto -> {resume_path or 'none found (fresh start)'}")
    will_resume = bool(resume_path and os.path.exists(resume_path))
    # explicit None tests: an explicitly passed falsy override (e.g.
    # --override-lr 0.0) must hit the fresh-start warning too
    if not will_resume and (
        any(v is not None for v in (override_lr, override_weight_decay,
                                    override_ema_decay))
        or reset_optimizer_state or repair_ema_on_resume
    ):
        print("[RESUME] WARNING: resume-time overrides requested but no "
              "checkpoint to resume — ignoring them (fresh start)")
        override_lr = override_weight_decay = override_ema_decay = None
        reset_optimizer_state, repair_ema_on_resume = False, False

    # LR / weight-decay overrides are optimizer-schedule inputs: apply them
    # to the config BEFORE building tx (the state-surgery-free equivalent of
    # main_train_loop.py:117-125).
    if override_lr is not None:
        cfg = TrainConfig(**{**cfg.to_dict(), "base_lr": float(override_lr)})
    if override_weight_decay is not None:
        cfg = TrainConfig(**{**cfg.to_dict(), "weight_decay": float(override_weight_decay)})

    if will_resume:
        # A checkpoint's opt_state layout is fixed by the config that wrote
        # it (flat_optimizer: raveled vector vs per-leaf tree); restoring
        # into a template built the other way is an Orbax structure
        # mismatch.  Reconcile from the meta sidecar — legacy metas predate
        # the knob and mean the tree layout — so ``train --resume`` works on
        # pre-flip checkpoints (the cli default moved to flat in round 2).
        saved_tc = _saved_train_config(resume_path)
        if (saved_tc is not None
                and saved_tc.flat_optimizer != cfg.flat_optimizer):
            print("[RESUME] adopting checkpoint optimizer layout:"
                  f" flat_optimizer={saved_tc.flat_optimizer}")
            cfg = TrainConfig(**{**cfg.to_dict(),
                                 "flat_optimizer": saved_tc.flat_optimizer})

    if init_params is None:
        dummy_x = jnp.zeros((1, img_size, img_size, model.config.in_channels))
        dummy_t = jnp.zeros((1,))
        cond_ch = int(getattr(model.config, "cond_channels", 0) or 0)
        init_kw = ({"x_cond": jnp.zeros((1, img_size, img_size, cond_ch))}
                   if cond_ch else {})
        init_params = model.init(jax.random.key(init_seed), dummy_x, dummy_t,
                                 **init_kw)

    tx = make_optimizer(cfg)
    state, _ = init_train_state(init_params, cfg, seed=init_seed, tx=tx)
    # class-conditional model => batches are (images, labels) end to end
    conditional = bool(getattr(model.config, "num_classes", 0))
    batch_shd, label_shd = None, None
    if mesh is not None:
        from ..parallel import batch_sharding, place_state

        state = place_state(state, mesh, fsdp=fsdp)
        batch_shd = batch_sharding(mesh)
        if conditional:
            from jax.sharding import NamedSharding, PartitionSpec

            label_shd = NamedSharding(
                mesh, PartitionSpec(batch_shd.spec[0]))
    train_step = make_train_step(model, sched, tx, cfg)
    sr_factor = int(getattr(cfg, "superres_factor", 0) or 0)
    probe_fn = (make_probe_fn(model, sched, superres_factor=sr_factor)
                if probe_timesteps else None)
    eval_fn = (make_eval_step(model, sched, superres_factor=sr_factor)
               if eval_loader is not None else None)

    global_step, start_epoch, resumed = 0, 0, False
    if will_resume:
        template = state
        state, meta = load_checkpoint(resume_path, template, components=resume_components)
        global_step = int(meta.get("global_step", int(jax.device_get(state.step))))
        start_epoch = int(meta.get("epoch", 0)) + 1
        print(
            f"[RESUME] loaded: {resume_path} | global_step={global_step}"
            f" | start_epoch={start_epoch}"
        )
        state = apply_resume_overrides(
            state,
            template,
            reset_optimizer_state=reset_optimizer_state,
            override_ema_decay=override_ema_decay,
            repair_ema=repair_ema_on_resume,
            ema_decay_after_repair=ema_decay_after_repair,
        )
        if mesh is not None:
            from ..parallel import place_state

            state = place_state(state, mesh, fsdp=fsdp)
        if override_lr is not None:
            print(f"[RESUME] override_lr -> {override_lr:.3e}")
        if override_weight_decay is not None:
            print(f"[RESUME] override_weight_decay -> {override_weight_decay:.3e}")
        resumed = True

    # header (format parity: main_train_loop.py:144-157)
    ema_str = f"{float(jax.device_get(state.ema_decay)):.6f}"
    print(rule())
    print(f"DDPM run: {run_name}")
    print(
        f"Backend: {jax.default_backend()} | devices: {jax.device_count()} |"
        f" EMA: {ema_str} | epochs: {epochs} | base_lr: {cfg.base_lr:.2e} |"
        f" warmup_steps: {cfg.warmup_steps}"
    )
    if resumed:
        print(
            "Active resume overrides:",
            f"reset_opt={reset_optimizer_state}",
            f"override_lr={override_lr}",
            f"override_wd={override_weight_decay}",
            f"override_ema={override_ema_decay}",
        )
    print(rule())
    print(
        f"{'ep':>3} | {'step':>8} | {'loss':>10} | {'lr':>9} | "
        f"{'batches':>8} | {'images':>8} | {'imgs/s':>7} | {'time':>8} | {'warmup':>6}"
    )
    print(rule())

    total_time = 0.0
    header_flag = [False]
    summary: Dict[str, Any] = {"epochs": []}
    metrics_path = (
        os.path.join(ckpt_dir, f"{run_name}_metrics.jsonl")
        if metrics_jsonl == "auto" else metrics_jsonl
    )
    if metrics_path is not None:
        summary["metrics_jsonl"] = metrics_path

    from .preemption import PreemptionFlag, catch_preemption

    if isinstance(handle_preemption, PreemptionFlag):
        # cooperative external flag (e.g. a scheduler thread): no signal
        # handlers installed, the caller trips it
        _pctx, stop_flag = None, handle_preemption
    else:
        _pctx = catch_preemption() if handle_preemption else None
        stop_flag = _pctx.__enter__() if _pctx is not None else PreemptionFlag()
    _fid_cache = {}  # true-FID extractor + fixed-reference stats, built once
    try:
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            if hasattr(train_loader, "set_epoch"):
                # pin the shuffle stream to the ABSOLUTE epoch: a resumed
                # run then continues the uninterrupted run's batch orders
                # instead of replaying epochs 0,1,2,... from scratch
                train_loader.set_epoch(epoch)
            state, avg_loss, n_batches, n_images = train_one_epoch(
                train_step,
                state,
                train_loader,
                batch_sharding=batch_shd,
                labeled=conditional,
                label_sharding=label_shd,
                max_batches=max_batches,
                log_every=log_every,
                probe_fn=probe_fn,
                probe_timesteps=probe_timesteps,
                log_mem=log_mem,
                log_grad_norm=log_grad_norm,
                epoch_header_printed=header_flag,
                stop_flag=stop_flag,
            )
            # tripped during the data pass => this epoch's pass was partial
            # and must be redone on resume; tripped later (sample/ckpt
            # hooks) => the epoch completed and resume continues after it
            epoch_partial = bool(stop_flag)
            # train_one_epoch's device_get of the accumulated loss already drained
            # the step chain (block_until_ready can no-op over remote transports)
            sec = time.time() - t0
            total_time += sec
            ips = n_images / sec if sec > 0 else 0.0
            global_step = int(jax.device_get(state.step))
            from .state import make_lr_schedule

            lr_now = float(make_lr_schedule(cfg)(max(global_step - 1, 0)))
            warm = (
                0.0
                if not cfg.warmup_steps
                else min(1.0, global_step / float(cfg.warmup_steps))
            )
            print(
                f"{epoch:3d} | {global_step:8d} | {avg_loss:10.5f} | {lr_now:9.2e} | "
                f"{n_batches:8d} | {n_images:8d} | {ips:7.1f} | {fmt_hms(sec):>8} | "
                f"{int(100 * warm):3d}%"
            )
            summary["epochs"].append(
                dict(epoch=epoch, loss=avg_loss, imgs_per_s=ips, seconds=sec)
            )

            # validation pass: raw and EMA params on identical (t, noise)
            # draws, so the two (and epochs) compare without MC jitter
            if (eval_fn is not None and not epoch_partial
                    and eval_every > 0 and epoch % eval_every == 0):
                if hasattr(eval_loader, "set_epoch"):
                    # both passes must see IDENTICAL batches (the raw-vs-EMA
                    # contract); a shuffled loader advances its epoch on
                    # every __iter__, so re-pin it before each pass
                    eval_loader.set_epoch(epoch)
                val = evaluate_loss(
                    eval_fn, state.params, eval_loader,
                    batch_sharding=batch_shd, labeled=conditional,
                    max_batches=eval_max_batches)
                if np.isfinite(val):
                    if hasattr(eval_loader, "set_epoch"):
                        eval_loader.set_epoch(epoch)
                    val_ema = evaluate_loss(
                        eval_fn, state.ema_params, eval_loader,
                        batch_sharding=batch_shd, labeled=conditional,
                        max_batches=eval_max_batches)
                    summary["epochs"][-1]["val_loss"] = val
                    if np.isfinite(val_ema):
                        summary["epochs"][-1]["val_loss_ema"] = val_ema
                        print(f"└─ [EVAL]   val_loss={val:.5f} |"
                              f" val_loss_ema={val_ema:.5f}")
                    else:
                        # the second pass saw zero batches: eval_loader is a
                        # one-shot iterator, not a re-iterable (the documented
                        # contract).  Record the raw loss, warn once.
                        print(f"└─ [EVAL]   val_loss={val:.5f} | WARNING:"
                              " EMA pass saw no batches — eval_loader must"
                              " be re-iterable (got a one-shot iterator?)")
                else:
                    # empty loader (or a diverged model): warn, don't record
                    print("└─ [EVAL]   no finite val loss (empty loader or"
                          " non-finite model output); skipping")

            # sampling hook: EMA-health-gated, fixed seed (main_train_loop.py:183-207)
            # (skipped on a partial epoch: preemption grace time goes to the save)
            if sample_fn is not None and not epoch_partial and sample_every > 0 and (
                    epoch % sample_every == 0 or epoch == epochs - 1):
                out_path = os.path.join(ckpt_dir, f"{run_name}_samples_e{epoch:03d}.png")
                ok, _, rel = ema_health(state.ema_params, state.params, rel_tol=2.0)
                use_ema = bool(ok and rel <= 1.0)
                params_for_sample = state.ema_params if use_ema else state.params
                samples = sample_fn(
                    model,
                    params_for_sample,
                    sched,
                    n=sample_n,
                    img_size=img_size,
                    save_path=out_path,
                    seed=sample_seed if sample_seed is not None else 0,
                )
                fid_msg = ""
                if (
                    fid_reference is not None
                    and isinstance(samples, np.ndarray)
                    and samples.ndim == 4
                ):
                    # rFID (random-CNN Fréchet distance): the offline stand-in
                    # for the FID north star (utils/fid.py).  Reference images
                    # arrive in training range [-1,1]; samples in [0,1].
                    from ..utils.fid import rfid

                    ref01 = (np.asarray(fid_reference, np.float32) + 1.0) / 2.0
                    score = rfid(ref01, samples)
                    summary["epochs"][-1]["rfid"] = score
                    fid_msg = f" | rFID={score:.3f}"
                    if fid_extractor:
                        # true FID via a mounted extractor file (the offline
                        # hook, utils/fid.py): scored per sampling epoch next
                        # to rFID so quality curves use the real metric the
                        # moment weights are available.  The extractor and
                        # the fixed reference set's stats are built ONCE —
                        # reloading ~100MB weights + re-featurizing the same
                        # images every epoch would be pure waste.
                        from ..utils.fid import (_stats, frechet_distance,
                                                 load_torch_extractor)

                        if "ex" not in _fid_cache:
                            _fid_cache["ex"] = load_torch_extractor(
                                fid_extractor)
                            _fid_cache["ref"] = _stats(_fid_cache["ex"](ref01))
                        fscore = frechet_distance(
                            *_fid_cache["ref"],
                            *_stats(_fid_cache["ex"](samples)))
                        summary["epochs"][-1]["fid"] = fscore
                        fid_msg += f" | FID={fscore:.3f}"
                print(
                    f"└─ [SAMPLE] grid -> {out_path} | EMA_used={use_ema}"
                    f" | rel={rel:.3f}{fid_msg}"
                )

            if metrics_path is not None:
                rec = dict(summary["epochs"][-1], global_step=global_step,
                           lr=lr_now, ts=time.time())
                if epoch_partial:
                    rec["partial"] = True  # redone after resume
                # strict JSON: json.dumps would emit the non-spec NaN token
                # for non-finite floats (e.g. a diverged loss) — null them
                rec = {k: (None if isinstance(v, float) and not np.isfinite(v)
                           else v) for k, v in rec.items()}
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

            # periodic save: never for a partial epoch — its meta would claim
            # the epoch completed and beat the preempt save at auto-resume
            if save_every and not epoch_partial and (
                    epoch % save_every == 0 or epoch == epochs - 1):
                ckpt_path = os.path.join(ckpt_dir, f"{run_name}_e{epoch:03d}")
                # async save: the device->host copy stages synchronously, disk
                # serialization + meta + mirror overlap the next epoch's compute
                t_save = time.time()
                save_checkpoint(
                    ckpt_path, state, epoch=epoch,
                    extra={"epoch": epoch, "global_step": global_step},
                    configs=configs_for_ckpt,
                    block=False, mirror_dir=mirror_dir,
                    fixed_mirror_name=fixed_mirror_name, log=print,
                )
                print(
                    f"└─ [CKPT]   saving (async) -> {ckpt_path}"
                    f" | dispatched in {1e3 * (time.time() - t_save):.0f} ms"
                )

            if stop_flag:
                # store epoch-1 when the data pass was partial so resume
                # (incl. "auto") redoes it, epoch when it completed;
                # global_step is exact either way, so the warmup/LR clock
                # stays correct
                save_epoch = epoch - 1 if epoch_partial else epoch
                ckpt_path = os.path.join(ckpt_dir, f"{run_name}_preempt")
                save_checkpoint(
                    ckpt_path, state, epoch=save_epoch,
                    extra={"epoch": save_epoch, "global_step": global_step},
                    configs=configs_for_ckpt,
                )
                print(
                    f"└─ [PREEMPT] signal={stop_flag.signum}: saved -> "
                    f"{ckpt_path}; stopping cleanly"
                )
                summary["preempted"] = True
                break
    finally:
        if _pctx is not None:
            _pctx.__exit__(None, None, None)

    if save_last and not summary.get("preempted"):
        # after preemption the _preempt save is the restorable truth; a
        # _last here would claim epoch=epochs-1 and wrongly end auto-resume
        ckpt_path = os.path.join(ckpt_dir, f"{run_name}_last")
        save_checkpoint(
            ckpt_path, state, epoch=epochs - 1,
            extra={"epoch": epochs - 1, "global_step": global_step},
            configs=configs_for_ckpt,
            mirror_dir=mirror_dir, fixed_mirror_name=fixed_mirror_name,
        )
        print(f"└─ [CKPT]   saved -> {ckpt_path}")

    wait_for_checkpoints()  # every async save durable before we return
    print(rule())
    print(f"Training finished in {fmt_hms(total_time)}")
    print(rule())
    summary["total_seconds"] = total_time
    return state, summary
