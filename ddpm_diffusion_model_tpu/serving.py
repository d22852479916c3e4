"""Minimal sampling service: HTTP endpoint over a loaded checkpoint.

The reference has no serving layer (SURVEY.md §1); this is the deployment
path for the TPU build: load a checkpoint once, keep the jitted DDIM sampler
warm, and serve PNG grids / raw tensors over HTTP.  Stdlib-only
(ThreadingHTTPServer); requests serialize onto the single device queue,
which is the right behavior for one accelerator.

    python -m ddpm_diffusion_model_tpu.serving --ckpt ck/run_last --port 8000
    GET /healthz                 -> {"status": "ok", ...}
    GET /sample?n=4&steps=50&eta=0.0&seed=7&format=png|npy
                &sampler=ddim|dpmpp|cm   (cm: consistency students, 1-NFE)
                &class_id=K&guidance=W   (conditional checkpoints: CFG)
    POST /edit   {"image": <b64 PNG>, "mode": "img2img"|"inpaint", ...}
                 -> edited grid (sampling/editing.py: SDEdit / RePaint)
    POST /upsample {"image": <b64 PNG>, "n": 4, "steps": 50, ...}
                 -> super-resolved grid (SR upsampler checkpoints only:
                    cond_channels > 0, sampling/superres.py; /sample and
                    /edit are rejected on those checkpoints and vice versa)
    GET /metrics                 -> request/sample/error counters + p50/p95
"""

from __future__ import annotations

import io
import json
import math
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

__all__ = ["SamplerService", "make_server", "main"]




class SamplerService:
    """Checkpoint-backed sampler with a warm jit cache."""

    def __init__(self, model, params, sched, img_size: int, use_ema_params=None,
                 use_mesh: bool = True, consistency: bool = False,
                 cm_guidance: Optional[float] = None,
                 cm_sigma_data: Optional[float] = None,
                 cm_timestep_scaling: Optional[float] = None):
        import time

        import jax

        self.model = model
        self.params = use_ema_params if use_ema_params is not None else params
        self.sched = sched
        self.img_size = img_size
        # consistency students (distill --mode consistency) serve sampler=cm
        # ONLY: their weights parameterize f_theta through c_skip/c_out, so
        # the plain eps samplers (and /edit, which rides the eps boundary)
        # would emit garbage; conversely plain checkpoints reject sampler=cm.
        self.consistency = bool(consistency)
        self.cm_guidance = cm_guidance  # baked-in CFG scale (meta), if any
        # CM parameterization scalings: serve with the values the student
        # was DISTILLED with (recorded in checkpoint extra; pre-knob
        # checkpoints mean the module defaults) — hard-coding defaults here
        # would silently diverge from the CLI sample-cm path for any
        # non-default student
        from .training.consistency import SIGMA_DATA, TIMESTEP_SCALING

        self.cm_sigma_data = float(
            SIGMA_DATA if cm_sigma_data is None else cm_sigma_data)
        self.cm_timestep_scaling = float(
            TIMESTEP_SCALING if cm_timestep_scaling is None
            else cm_timestep_scaling)
        # mesh-aware serving: with >1 visible device, replicate the params
        # over a ('data',) mesh once and shard each coalesced eta=0 batch's
        # init noise over it — the SAME jitted scan becomes SPMD (GSPMD
        # follows the input sharding), so a pod serves n/devices per chip
        # with zero per-step communication.  Seed-to-image mapping is
        # unchanged (each request's rows come from its own seed's init
        # noise), which is why this routes through _ddim_from_init_jit and
        # not sample_grid_sharded (that draws grid noise from one seed).
        self.mesh = None
        if use_mesh and jax.device_count() > 1:
            from .parallel import make_mesh, put_global

            self.mesh = make_mesh()
            self.params = put_global(self.params, self.mesh)
            self.sched = put_global(self.sched, self.mesh)
        self._lock = threading.Lock()
        # observability: counters + a bounded window of recent latencies,
        # under their OWN mutex — the device lock is held for minutes during
        # a cold compile, and /metrics must keep answering through that
        self._stats_lock = threading.Lock()
        self._t_start = time.time()
        self._stats = {"requests": 0, "samples": 0, "errors": 0,
                       "client_errors": 0, "edits": 0, "upsamples": 0,
                       "coalesced_batches": 0, "multi_request_batches": 0,
                       "batch_size_hist": {}, "sharded_batches": 0}
        # SR upsampler checkpoints (cond_channels > 0) serve /upsample ONLY:
        # their forward requires x_cond, which /sample and /edit cannot build
        self.cond_channels = int(
            getattr(model.config, "cond_channels", 0) or 0)
        self._latencies: list = []  # seconds, last _LAT_WINDOW completions
        # request coalescing (eta=0): pending queues per (steps, schedule)
        self._q_lock = threading.Lock()
        self._queues: dict = {}

    _LAT_WINDOW = 256
    COALESCE_WINDOW_S = 0.005

    def record_error(self) -> None:
        with self._stats_lock:
            self._stats["errors"] += 1

    def record_client_error(self) -> None:
        with self._stats_lock:
            self._stats["client_errors"] += 1

    def metrics(self) -> dict:
        """Service counters and latency quantiles over the recent window —
        the ``/metrics`` endpoint payload."""
        import time

        with self._stats_lock:
            lats = list(self._latencies)
            stats = dict(self._stats)
            stats["batch_size_hist"] = dict(stats["batch_size_hist"])
        import jax

        out = {
            **stats,
            "uptime_s": round(time.time() - self._t_start, 1),
            "latency_window": len(lats),
            # per-chip utilization view: with a mesh, each coalesced batch
            # runs samples/devices rows per chip
            "devices": jax.device_count(),
            "mesh": list(self.mesh.shape.values()) if self.mesh else None,
        }
        if lats:
            q = np.quantile(np.asarray(lats), [0.5, 0.95, 1.0])
            out.update(latency_p50_s=round(float(q[0]), 4),
                       latency_p95_s=round(float(q[1]), 4),
                       latency_max_s=round(float(q[2]), 4))
        return out

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, config_path: Optional[str] = None,
                        ema: bool = True, use_mesh: bool = True):
        from .cli import _load_state
        from .training.checkpoint import read_meta
        from .utils.config import ExperimentConfig, get_preset

        exp = None
        if config_path:
            with open(config_path) as f:
                exp = ExperimentConfig.from_json(f.read())
        else:
            meta = read_meta(ckpt_path) or {}
            if meta.get("configs", {}).get("experiment"):
                exp = ExperimentConfig.from_dict(meta["configs"]["experiment"])
        if exp is None:
            exp = get_preset("celeba64_low")
        model, sched, state, meta = _load_state(ckpt_path, exp)
        extra = (meta or {}).get("extra", {}) or {}
        return cls(
            model, state.params, sched, exp.img_size,
            use_ema_params=state.ema_params if ema else None,
            use_mesh=use_mesh,
            consistency=extra.get("distill_mode") == "consistency",
            cm_guidance=extra.get("distill_guidance"),
            cm_sigma_data=extra.get("cm_sigma_data"),
            cm_timestep_scaling=extra.get("cm_timestep_scaling"),
        )

    # shape/ladder are static jit arguments: every distinct (n, steps) pair
    # is a full XLA compile (minutes over a tunnel).  Requests are therefore
    # BUCKETED — n rounds up to a power of two, steps snaps to a fixed
    # ladder — bounding the compile cache at |N_BUCKETS| x |STEP_CHOICES|
    # entries instead of letting queries mint unbounded recompiles.
    STEP_CHOICES = (1, 2, 5, 10, 25, 50, 100, 250, 1000)
    MAX_N = 64
    # guidance is likewise a compile-time constant (it gates the doubled
    # CFG forward inside the scan) AND a coalescer queue key: snap it to a
    # 0.25 grid on [0, 8] so neither the XLA cache nor self._queues can be
    # grown without bound by adversarial query strings.
    GUIDANCE_STEP = 0.25
    MAX_GUIDANCE = 8.0
    SCHEDULE_KINDS = ("t_linear", "linear", "cosine", "t_cosine", "karras",
                      "alpha_bar_cosine")

    def sample(self, n: int = 4, steps: int = 50, eta: float = 0.0,
               seed: int = 0, schedule_kind: str = "t_linear",
               sampler: str = "ddim", class_id=None, guidance: float = 1.0):
        """Returns ``(images, used)``: (n, H, W, C) float [0,1] plus a dict
        of the parameters ACTUALLY used after bucketing (``n``, ``steps``),
        so callers can see when their request was snapped.  Thread-safe;
        device work serializes.

        eta=0 requests (the deterministic default) are COALESCED: concurrent
        requests with the same (steps, schedule, guidance) landing within a
        short window run as ONE device batch.  Each request's trajectory
        depends only on its own seed's init noise (eta=0 adds no in-loop
        noise) and its OWN label, so per-seed determinism is independent of
        what it was batched with — labels are per-sample, so different
        classes coalesce freely (an unlabeled request on a conditional
        checkpoint rides as the NULL token, for which the CFG combination
        collapses to the unconditional forward exactly).

        ``class_id``/``guidance``: classifier-free guidance on conditional
        checkpoints (``model.num_classes > 0``); rejected otherwise."""
        import time

        if self.cond_channels:
            raise ValueError(
                "this is an SR upsampler checkpoint (cond_channels > 0) — "
                "use POST /upsample with a low-res image")
        if sampler not in ("ddim", "dpmpp", "cm"):
            raise ValueError(
                f"sampler must be 'ddim'|'dpmpp'|'cm', got {sampler!r}")
        if self.consistency != (sampler == "cm"):
            raise ValueError(
                "sampler=cm serves consistency-distilled checkpoints only"
                if sampler == "cm" else
                "this is a consistency student checkpoint — its weights "
                "parameterize f_theta, not eps; use sampler=cm (1-NFE)")
        if sampler == "cm":
            # 1-NFE only: multistep CM re-noises from ONE loop key, which
            # would entangle coalesced requests' seeds — rejected the same
            # way the stochastic SDE solver is (use the CLI sample-cm for
            # steps > 1).  Deterministic per seed, so it coalesces freely.
            if int(steps) != 1:
                raise ValueError(
                    "sampler=cm serves 1-NFE only (steps=1): multistep CM "
                    "refinement is stochastic per batch — use the CLI "
                    "sample-cm for steps > 1")
            if guidance != 1.0:
                baked = (f" (w={self.cm_guidance} baked in at distillation)"
                         if self.cm_guidance is not None else "")
                raise ValueError(
                    "sampler=cm: guidance is fixed at distillation time"
                    + baked + "; pass class_id only")
        if schedule_kind not in self.SCHEDULE_KINDS:
            # validate BEFORE the eta fork so a bad kind is the same
            # ValueError (→ 400) whether or not the request coalesces
            raise ValueError(
                f"schedule must be one of {self.SCHEDULE_KINDS}, "
                f"got {schedule_kind!r}")
        if not math.isfinite(guidance):
            raise ValueError(f"guidance must be finite, got {guidance!r}")
        # snap guidance to the bounded compile/coalesce grid (see the class
        # constants); 1.0 always maps to itself so unconditional requests
        # never pay CFG
        guidance = min(max(float(guidance), 0.0), self.MAX_GUIDANCE)
        guidance = round(guidance / self.GUIDANCE_STEP) * self.GUIDANCE_STEP
        num_classes = int(getattr(self.model.config, "num_classes", 0))
        if class_id is not None or guidance != 1.0:
            if not num_classes:
                raise ValueError(
                    "class_id/guidance need a class-conditional checkpoint "
                    "(model.num_classes > 0)")
            if class_id is not None and not 0 <= int(class_id) < num_classes:
                raise ValueError(
                    f"class_id {class_id} out of range [0, {num_classes})")
        if sampler in ("dpmpp", "cm"):
            eta = 0.0  # deterministic samplers; always coalescible
        if sampler == "cm":
            # the CM kernel ignores the DDIM ladder entirely — canonicalize
            # the queue key so identical 1-NFE requests differing only in
            # schedule= coalesce instead of landing in separate queues
            schedule_kind = "t_linear"
        n = max(1, min(int(n), self.MAX_N))
        steps = min(self.STEP_CHOICES, key=lambda s: abs(s - int(steps)))
        used = {"n": int(n), "steps": int(steps), "eta": float(eta),
                "seed": int(seed), "schedule": schedule_kind,
                "sampler": sampler}
        if num_classes:
            used["class_id"] = None if class_id is None else int(class_id)
            used["guidance"] = float(guidance)
        if sampler == "cm" and num_classes and class_id is None:
            # CD supervises only real labels (training/consistency.py); the
            # NULL-token pathway this request rides on is untrained
            used["warning"] = (
                "conditional consistency student, no class_id: output uses "
                "the untrained NULL class and may be degraded — pass "
                "class_id")
        # per-sample label: requests without a class ride as the NULL token
        label = (None if not num_classes
                 else (num_classes if class_id is None else int(class_id)))

        t0 = time.perf_counter()
        if eta == 0.0:
            out = self._sample_coalesced(n, steps, schedule_kind, seed,
                                         sampler, label, float(guidance))
        else:
            out = self._sample_direct(n, steps, eta, schedule_kind, seed,
                                      label, float(guidance))
        with self._stats_lock:
            self._stats["requests"] += 1
            self._stats["samples"] += int(n)
            self._latencies.append(time.perf_counter() - t0)
            del self._latencies[:-self._LAT_WINDOW]
        return out, used

    # editing buckets: strength snaps to a 0.05 grid (it sets the STATIC
    # truncated-ladder length), resamples is a static loop bound — both
    # capped so query strings cannot mint unbounded XLA compiles.
    STRENGTH_STEP = 0.05
    MAX_RESAMPLES = 4

    def edit(self, image01: np.ndarray, mode: str = "img2img", n: int = 4,
             steps: int = 50, strength: float = 0.6, eta: float = 0.0,
             seed: int = 0, box=None, mask01: Optional[np.ndarray] = None,
             resamples: int = 1, class_id=None, guidance: float = 1.0):
        """Edit a real image (``/edit``): SDEdit ``img2img`` or RePaint-style
        ``inpaint`` (sampling/editing.py) with the same bucketing contract as
        :meth:`sample`.  ``image01``: (H, W, C) float [0,1] at the service
        resolution.  Returns ``(images01, used)``; n variations each drawing
        independent noise.  Thread-safe; device work serializes."""
        import time

        import jax
        import jax.numpy as jnp

        from .sampling.editing import (
            _img2img_jit, _inpaint_jit, box_mask, truncate_ladder)
        from .sampling.loops import to_unit_interval
        from .sampling.timesteps import build_ddim_schedule

        if self.cond_channels:
            raise ValueError(
                "this is an SR upsampler checkpoint (cond_channels > 0) — "
                "use POST /upsample with a low-res image")
        if self.consistency:
            raise ValueError(
                "/edit rides the eps-prediction boundary, which a "
                "consistency student's weights no longer satisfy — edit "
                "with the base (pre-distillation) checkpoint")
        if mode not in ("img2img", "inpaint"):
            raise ValueError(f"mode must be 'img2img'|'inpaint', got {mode!r}")
        if not math.isfinite(guidance) or not math.isfinite(strength):
            raise ValueError("strength/guidance must be finite")
        guidance = min(max(float(guidance), 0.0), self.MAX_GUIDANCE)
        guidance = round(guidance / self.GUIDANCE_STEP) * self.GUIDANCE_STEP
        num_classes = int(getattr(self.model.config, "num_classes", 0))
        if class_id is not None or guidance != 1.0:
            if not num_classes:
                raise ValueError(
                    "class_id/guidance need a class-conditional checkpoint "
                    "(model.num_classes > 0)")
            if class_id is not None and not 0 <= int(class_id) < num_classes:
                raise ValueError(
                    f"class_id {class_id} out of range [0, {num_classes})")
        S = self.img_size
        img = np.asarray(image01, np.float32)
        if img.shape != (S, S, self.model.config.in_channels):
            raise ValueError(
                f"image must be ({S}, {S}, {self.model.config.in_channels}) "
                f"in [0,1], got {img.shape}")
        n = max(1, min(int(n), self.MAX_N))
        n_bucket = 1 << (n - 1).bit_length()
        steps = min(self.STEP_CHOICES, key=lambda s: abs(s - int(steps)))
        strength = min(max(float(strength), self.STRENGTH_STEP), 1.0)
        strength = round(strength / self.STRENGTH_STEP) * self.STRENGTH_STEP
        resamples = max(1, min(int(resamples), self.MAX_RESAMPLES))
        eta = min(max(float(eta), 0.0), 1.0)
        used = {"mode": mode, "n": int(n), "steps": int(steps),
                "eta": float(eta), "seed": int(seed)}
        if num_classes:
            used["class_id"] = None if class_id is None else int(class_id)
            used["guidance"] = float(guidance)
        label = (None if not num_classes or class_id is None
                 else jnp.full((n_bucket,), int(class_id), jnp.int32))

        init = jnp.broadcast_to(
            jnp.asarray(img * 2.0 - 1.0), (n_bucket, *img.shape))
        ts = build_ddim_schedule(
            "t_linear", steps, self.sched.T,
            alphas_cumprod=np.asarray(self.sched.alphas_cumprod))
        key = jax.random.key(int(seed))
        t0 = time.perf_counter()
        if mode == "img2img":
            used["strength"] = float(strength)
            ts = tuple(int(t) for t in truncate_ladder(ts, strength))
            with self._lock:
                x = _img2img_jit(self.model, self.params, self.sched, init,
                                 key, ts, eta, y=label, guidance=guidance)
        else:
            used["resamples"] = int(resamples)
            if (box is None) == (mask01 is None):
                raise ValueError(
                    "inpaint needs exactly one of 'box' or 'mask'")
            if box is not None:
                try:
                    mask = box_mask(S, [int(v) for v in box])
                except (TypeError, KeyError) as e:
                    # non-iterable / wrong-typed box is a client error, not
                    # a 500 (box_mask's own ValueErrors already map to 400)
                    raise ValueError(
                        f"box must be 4 ints (x0,y0,x1,y1): {e}") from e
            else:
                m = np.asarray(mask01, np.float32)
                if m.shape[:2] != (S, S):
                    raise ValueError(
                        f"mask must be ({S}, {S}[, 1]), got {m.shape}")
                mask = (m.reshape(S, S, -1)[..., :1] >= 0.5).astype(np.float32)
            with self._lock:
                x = _inpaint_jit(self.model, self.params, self.sched, init,
                                 jnp.asarray(mask), key,
                                 tuple(int(t) for t in ts), eta,
                                 int(resamples), y=label, guidance=guidance)
        out = np.asarray(to_unit_interval(x[:n]))
        with self._stats_lock:
            self._stats["requests"] += 1
            self._stats["edits"] += 1
            self._stats["samples"] += int(n)
            self._latencies.append(time.perf_counter() - t0)
            del self._latencies[:-self._LAT_WINDOW]
        return out, used

    def upsample(self, image01: np.ndarray, n: int = 4, steps: int = 50,
                 eta: float = 0.0, seed: int = 0, class_id=None,
                 guidance: float = 1.0):
        """Super-resolve a low-res image (``/upsample``) with an SR
        upsampler checkpoint (``cond_channels > 0``, sampling/superres.py).
        ``image01``: (h, w, C) float [0,1] at ANY resolution <= the service
        resolution — it's resized on-device into the conditioning channels.
        Returns ``(images01, used)``: n variations drawing independent
        noise over the shared conditioning.  Same bucketing contract as
        :meth:`edit` (n rounds to a power of two, steps snaps to
        STEP_CHOICES); eta is a traced scalar so it never mints a compile.
        Thread-safe; device work serializes."""
        import time

        import jax
        import jax.numpy as jnp

        from .sampling.loops import to_unit_interval
        from .sampling.superres import _cond_from_low, _upsample_jit
        from .sampling.timesteps import build_ddim_schedule

        if not self.cond_channels:
            raise ValueError(
                "upsample needs an SR upsampler checkpoint "
                "(cond_channels > 0) — this service holds a plain denoiser; "
                "use GET /sample")
        if not math.isfinite(guidance) or not math.isfinite(eta):
            raise ValueError("eta/guidance must be finite")
        guidance = min(max(float(guidance), 0.0), self.MAX_GUIDANCE)
        guidance = round(guidance / self.GUIDANCE_STEP) * self.GUIDANCE_STEP
        num_classes = int(getattr(self.model.config, "num_classes", 0))
        if class_id is not None or guidance != 1.0:
            if not num_classes:
                raise ValueError(
                    "class_id/guidance need a class-conditional checkpoint "
                    "(model.num_classes > 0)")
            if class_id is not None and not 0 <= int(class_id) < num_classes:
                raise ValueError(
                    f"class_id {class_id} out of range [0, {num_classes})")
        S = self.img_size
        img = np.asarray(image01, np.float32)
        C = self.model.config.in_channels
        if (img.ndim != 3 or img.shape[-1] != C
                or not 0 < img.shape[0] <= S or not 0 < img.shape[1] <= S):
            raise ValueError(
                f"image must be (h<={S}, w<={S}, {C}) in [0,1], "
                f"got {img.shape}")
        n = max(1, min(int(n), self.MAX_N))
        n_bucket = 1 << (n - 1).bit_length()
        steps = min(self.STEP_CHOICES, key=lambda s: abs(s - int(steps)))
        eta = min(max(float(eta), 0.0), 1.0)
        used = {"n": int(n), "steps": int(steps), "eta": float(eta),
                "seed": int(seed), "low_res": list(img.shape[:2])}
        if num_classes:
            used["class_id"] = None if class_id is None else int(class_id)
            used["guidance"] = float(guidance)
        label = (None if not num_classes or class_id is None
                 else jnp.full((n_bucket,), int(class_id), jnp.int32))

        cond = _cond_from_low(self.model, img * 2.0 - 1.0, n_bucket)
        ts = build_ddim_schedule(
            "t_linear", steps, self.sched.T,
            alphas_cumprod=np.asarray(self.sched.alphas_cumprod))
        t0 = time.perf_counter()
        with self._lock:
            x = _upsample_jit(
                self.model, self.params, self.sched, cond,
                jax.random.key(int(seed)), tuple(int(t) for t in ts),
                float(eta), y=label, guidance=float(guidance))
        out = np.asarray(to_unit_interval(x[:n]))
        with self._stats_lock:
            self._stats["requests"] += 1
            self._stats["upsamples"] += 1
            self._stats["samples"] += int(n)
            self._latencies.append(time.perf_counter() - t0)
            del self._latencies[:-self._LAT_WINDOW]
        return out, used

    def _sample_direct(self, n, steps, eta, schedule_kind, seed,
                       label=None, guidance=1.0):
        """One un-batched request (the eta>0 path: ancestral noise inside
        the loop comes from one key, so merging would entangle seeds)."""
        import jax
        import jax.numpy as jnp

        from .sampling.inference import _ddim_jit
        from .sampling.loops import to_unit_interval
        from .sampling.timesteps import build_ddim_schedule

        n_bucket = 1 << (n - 1).bit_length()  # next power of two
        ts = build_ddim_schedule(
            schedule_kind, steps, self.sched.T,
            alphas_cumprod=np.asarray(self.sched.alphas_cumprod),
        )
        y = (None if label is None
             else jnp.full((n_bucket,), int(label), jnp.int32))
        with self._lock:
            x, _ = _ddim_jit(
                self.model, self.params, self.sched, jax.random.key(seed),
                (n_bucket, self.img_size, self.img_size,
                 self.model.config.in_channels),
                tuple(int(t) for t in ts), eta, None,
                y=y, guidance=guidance,
            )
        return np.asarray(to_unit_interval(x[:n]))

    def _sample_coalesced(self, n, steps, schedule_kind, seed,
                          sampler="ddim", label=None, guidance=1.0):
        """Enqueue; the first thread on an empty queue becomes the leader,
        waits COALESCE_WINDOW_S for company, then takes over the WHOLE queue
        in one atomic grab and serves it in <= MAX_N chunks.  Requests
        arriving after the grab see an empty queue and self-elect — the
        leader never serves traffic that arrived after its takeover, so its
        own latency is bounded by what was queued at window end."""
        import time

        req = {"n": n, "seed": seed, "label": label,
               "event": threading.Event(), "out": None, "err": None}
        # guidance keys the queue (it is a compile-time constant of the
        # kernel); labels are per-sample and coalesce freely
        key = (sampler, steps, schedule_kind, guidance)
        with self._q_lock:
            q = self._queues.setdefault(key, [])
            q.append(req)
            leader = len(q) == 1
        if leader:
            time.sleep(self.COALESCE_WINDOW_S)
            with self._q_lock:
                taken, q[:] = q[:], []
            while taken:
                batch, total = [], 0
                while taken and total + taken[0]["n"] <= self.MAX_N:
                    batch.append(taken.pop(0))
                    total += batch[-1]["n"]
                if not batch:            # oversize safety (n <= MAX_N holds)
                    batch = [taken.pop(0)]
                try:
                    outs = self._run_eta0_batch(batch, steps, schedule_kind,
                                                sampler, guidance)
                    for r, o in zip(batch, outs):
                        r["out"] = o
                except Exception as e:  # noqa: BLE001 — deliver to waiters
                    for r in batch:
                        r["err"] = e
                for r in batch:
                    r["event"].set()
        if not req["event"].wait(timeout=900):  # cold compiles take minutes
            raise TimeoutError("coalesced sample timed out")
        if req["err"] is not None:
            # wrap per waiter: re-raising ONE exception object from several
            # threads races on its __traceback__ mutation
            raise RuntimeError(
                f"coalesced sample failed: {req['err']!r}") from req["err"]
        return req["out"]

    def _run_eta0_batch(self, batch, steps, schedule_kind, sampler="ddim",
                        guidance=1.0):
        """ONE deterministic scan (DDIM eta=0 or DPM-Solver++(2M)) over the
        concatenated per-request init noise; total padded to the next power
        of two so the compile cache stays bounded.

        Each request's rows are ``normal(split(key(seed))[0], (n, ...))`` —
        the SAME seed-to-image mapping as the un-coalesced ``_ddim_jit``
        path (it splits the key the same way, and threefry draws are
        prefix-stable across its n_bucket padding), so results are
        compatible with CLI sampling and with pre-coalescing deployments."""
        import jax
        import jax.numpy as jnp

        from .sampling.inference import (
            _ddim_from_init_jit, _dpmpp_from_init_jit,
        )
        from .sampling.loops import to_unit_interval
        from .sampling.timesteps import build_ddim_schedule

        if sampler == "cm":
            from .training.consistency import _cm_from_init_jit

            def kernel(model, params, sched, x_init, ts, y=None, guidance=1.0):
                return _cm_from_init_jit(
                    model, params, sched, x_init, y=y,
                    sigma_data=self.cm_sigma_data,
                    timestep_scaling=self.cm_timestep_scaling)

            ts = ()  # the CM kernel takes no ladder
        else:
            kernel = (_dpmpp_from_init_jit if sampler == "dpmpp"
                      else _ddim_from_init_jit)
            ts = tuple(int(t) for t in build_ddim_schedule(
                schedule_kind, steps, self.sched.T,
                alphas_cumprod=np.asarray(self.sched.alphas_cumprod),
            ))
        H, C = self.img_size, self.model.config.in_channels
        sizes = [r["n"] for r in batch]
        total = sum(sizes)
        total_b = 1 << (total - 1).bit_length()
        if self.mesh is not None:
            # every chip needs equal rows: pad to a multiple of the mesh
            # (still bounded buckets: pow2s and mesh multiples up to 2*MAX_N)
            n_dev = int(self.mesh.devices.size)
            total_b = max(total_b, ((total_b + n_dev - 1) // n_dev) * n_dev)
        inits = [
            jax.random.normal(
                jax.random.split(jax.random.key(r["seed"]))[0],
                (r["n"], H, H, C), dtype=jnp.float32)
            for r in batch
        ]
        if total_b > total:
            inits.append(jax.random.normal(
                jax.random.key(0), (total_b - total, H, H, C),
                dtype=jnp.float32))
        x_init = jnp.concatenate(inits)
        y = None
        if any(r["label"] is not None for r in batch):
            nc = int(getattr(self.model.config, "num_classes", 0))
            labels = np.concatenate(
                [np.full(r["n"], r["label"], np.int32) for r in batch])
            if total_b > total:  # padding rows ride as the NULL token
                labels = np.concatenate(
                    [labels, np.full(total_b - total, nc, np.int32)])
            y = jnp.asarray(labels)
        if self.mesh is not None:
            from .parallel import batch_sharding

            x_init = jax.device_put(x_init, batch_sharding(self.mesh))
        with self._lock:
            x = kernel(self.model, self.params, self.sched, x_init, ts,
                       y=y, guidance=guidance)
        # slice the padding off ON DEVICE before the host fetch
        x01 = np.asarray(to_unit_interval(x[:total]))
        with self._stats_lock:
            self._stats["coalesced_batches"] += 1
            if len(batch) >= 2:
                # batches that actually merged >1 request — the counter a
                # loss-of-coalescing regression cannot fake (single-request
                # batches bump coalesced_batches too)
                self._stats["multi_request_batches"] += 1
            hist = self._stats["batch_size_hist"]
            hist[str(len(batch))] = hist.get(str(len(batch)), 0) + 1
            if self.mesh is not None:
                self._stats["sharded_batches"] += 1
        outs, off = [], 0
        for s in sizes:
            outs.append(x01[off:off + s])
            off += s
        return outs


def make_server(service: SamplerService, host: str = "127.0.0.1", port: int = 8000):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "img_size": service.img_size,
                    "T": service.sched.T,
                    # published bucketing contract: steps snap to this ladder,
                    # n is capped at max_n (actual values echo back per
                    # request in X-Used-* headers)
                    "step_choices": list(service.STEP_CHOICES),
                    "max_n": service.MAX_N,
                    # 0 = unconditional checkpoint (class_id/guidance rejected)
                    "num_classes": int(getattr(service.model.config,
                                               "num_classes", 0)),
                    "edit_modes": ([] if service.consistency
                                   else ["img2img", "inpaint"]),
                    # true = consistency student: sampler=cm (1-NFE) is the
                    # only sampling route; ddim/dpmpp/edit are rejected
                    "consistency": service.consistency,
                    # conditional CM students: CD never trains the NULL
                    # token, so requests without class_id are degraded
                    **({"consistency_caveat":
                        "conditional student; requests without class_id "
                        "use the untrained NULL class"}
                       if service.consistency
                       and int(getattr(service.model.config,
                                       "num_classes", 0)) else {}),
                    # true = SR upsampler checkpoint: POST /upsample is the
                    # only sampling endpoint (it needs a low-res input)
                    "upsampler": bool(service.cond_channels),
                })
                return
            if url.path == "/metrics":
                self._json(200, service.metrics())
                return
            if url.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                n = max(1, min(int(q.get("n", 4)), 64))
                steps = max(1, min(
                    int(q.get("steps", 1 if service.consistency else 50)),
                    1000))
                eta = float(q.get("eta", 0.0))
                seed = int(q.get("seed", 0))
                fmt = q.get("format", "png")
                kind = q.get("schedule", "t_linear")
                sampler = q.get("sampler",
                                "cm" if service.consistency else "ddim")
                if sampler not in ("ddim", "dpmpp", "cm"):
                    raise ValueError(
                        f"sampler must be ddim|dpmpp|cm, got {sampler}")
                class_id = (int(q["class_id"]) if "class_id" in q else None)
                guidance = float(q.get("guidance", 1.0))
            except ValueError as e:
                service.record_client_error()
                self._json(400, {"error": f"bad parameter: {e}"})
                return
            try:
                x, used = service.sample(n=n, steps=steps, eta=eta, seed=seed,
                                         schedule_kind=kind, sampler=sampler,
                                         class_id=class_id, guidance=guidance)
            except ValueError as e:
                # sample() validates every request parameter up front
                # (sampler/schedule/guidance/class_id), so a ValueError here
                # is a client error by construction — counted separately
                # from device-side failures in /metrics
                service.record_client_error()
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # surface sampler errors as 500s
                service.record_error()
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send_images(x, used, fmt)

        def _send_images(self, x, used, fmt):
            if fmt == "npy":
                buf = io.BytesIO()
                np.save(buf, x)
                body = buf.getvalue()
                ctype = "application/octet-stream"
            else:
                from PIL import Image

                from .utils.images import make_grid

                grid = make_grid(x)
                arr = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="PNG")
                body = buf.getvalue()
                ctype = "image/png"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            # report the snapped parameters actually used (compile-cache
            # bucketing may differ from the request; never rewrite silently)
            self.send_header("X-Used-N", str(used["n"]))
            self.send_header("X-Used-Steps", str(used["steps"]))
            self.end_headers()
            self.wfile.write(body)

        MAX_EDIT_BODY = 32 << 20  # 32 MiB of JSON+base64 is plenty

        def do_POST(self):
            import base64

            url = urlparse(self.path)
            if url.path == "/upsample":
                self._do_upsample()
                return
            if url.path != "/edit":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if not 0 < length <= self.MAX_EDIT_BODY:
                    raise ValueError(f"body length {length} out of range")
                req = json.loads(self.rfile.read(length))
                if "image" not in req:
                    raise ValueError("missing 'image' (base64 PNG/JPEG)")

                from .utils.images import load_image

                img01 = load_image(
                    io.BytesIO(base64.b64decode(req["image"])),
                    size=service.img_size)
                mask01 = None
                if req.get("mask") is not None:
                    mask01 = load_image(
                        io.BytesIO(base64.b64decode(req["mask"])),
                        size=service.img_size, grayscale=True)
                kw = dict(
                    mode=str(req.get("mode", "img2img")),
                    n=int(req.get("n", 4)),
                    steps=int(req.get("steps", 50)),
                    strength=float(req.get("strength", 0.6)),
                    eta=float(req.get("eta", 0.0)),
                    seed=int(req.get("seed", 0)),
                    box=req.get("box"),
                    mask01=mask01,
                    resamples=int(req.get("resamples", 1)),
                    class_id=(int(req["class_id"])
                              if req.get("class_id") is not None else None),
                    guidance=float(req.get("guidance", 1.0)),
                )
                fmt = req.get("format", "png")
            except Exception as e:  # noqa: BLE001
                # body decode errors (bad base64 / not an image / bad JSON /
                # bad field types) are client errors, full stop
                service.record_client_error()
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                x, used = service.edit(img01, **kw)
            except ValueError as e:
                service.record_client_error()
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — surface as 500
                service.record_error()
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send_images(x, used, fmt)

        def _do_upsample(self):
            import base64

            try:
                length = int(self.headers.get("Content-Length", 0))
                if not 0 < length <= self.MAX_EDIT_BODY:
                    raise ValueError(f"body length {length} out of range")
                req = json.loads(self.rfile.read(length))
                if "image" not in req:
                    raise ValueError("missing 'image' (base64 PNG/JPEG)")

                from .utils.images import load_image

                # low-res input keeps its NATIVE size (the conditioning
                # resize happens on-device); optional low_size crops first
                low_size = (int(req["low_size"])
                            if req.get("low_size") is not None else None)
                img01 = load_image(
                    io.BytesIO(base64.b64decode(req["image"])),
                    size=low_size)
                kw = dict(
                    n=int(req.get("n", 4)),
                    steps=int(req.get("steps", 50)),
                    eta=float(req.get("eta", 0.0)),
                    seed=int(req.get("seed", 0)),
                    class_id=(int(req["class_id"])
                              if req.get("class_id") is not None else None),
                    guidance=float(req.get("guidance", 1.0)),
                )
                fmt = req.get("format", "png")
            except Exception as e:  # noqa: BLE001 — body decode = client error
                service.record_client_error()
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                x, used = service.upsample(img01, **kw)
            except ValueError as e:
                service.record_client_error()
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — surface as 500
                service.record_error()
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send_images(x, used, fmt)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--no-mesh", action="store_true",
                    help="serve single-device even when more are visible")
    args = ap.parse_args(argv)

    service = SamplerService.from_checkpoint(
        args.ckpt, config_path=args.config, ema=not args.no_ema,
        use_mesh=not args.no_mesh,
    )
    server = make_server(service, args.host, args.port)
    # report the BOUND port (port 0 asks the OS for an ephemeral one)
    print(f"[SERVE] sampling service on http://{args.host}:"
          f"{server.server_address[1]}", flush=True)

    # graceful drain: SIGTERM/SIGINT stops accepting, lets in-flight
    # requests finish (shutdown() blocks until the serve loop exits), then
    # returns — same preemption machinery as training (training/preemption.py)
    from .training.preemption import catch_preemption

    with catch_preemption() as stop:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            while t.is_alive() and not stop:
                t.join(timeout=0.5)
        finally:
            died = not stop and not t.is_alive()  # crash, not a drain
            print(f"[SERVE] draining (signal={stop.signum}) ...")
            server.shutdown()      # stop the accept loop
            # join the in-flight handler threads too (ThreadingHTTPServer
            # has block_on_close=True): without this, daemon handlers are
            # killed at interpreter exit mid-request
            server.server_close()
            t.join(timeout=30)
            print(f"[SERVE] stopped | {json.dumps(service.metrics())}")
            if died:
                print("[SERVE] ERROR: server thread died without a signal")
    return 1 if died else 0


if __name__ == "__main__":
    sys.exit(main())
