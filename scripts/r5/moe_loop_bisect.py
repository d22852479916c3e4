"""Bisect the r4 KNOWN ISSUE: MoE-DiT through the CLI epoch loop +
DeviceCacheLoader ran at ~56 imgs/s vs 950 imgs/s for the identical
model/step through the direct path (docs/BENCH.md "MoE payoff (r4)").

One process, one compile of the MoE train step, then the same 30 steps
timed through progressively more of the product path:

  E  payoff-style direct: fp32 corpus as jit arg, randint gather   (expect ~950)
  D  loader._gather(idx) feeding the step, bare for loop           (loader gather)
  C  loader __iter__ feeding the step, bare for loop               (+iterator glue)
  B  loader through device_prefetch feeding the step               (+prefetch glue)
  A  full train_one_epoch(max_batches=30)                          (expect ~56 if repro)

Each variant reports dispatch time (sum of step-call returns) separately
from the end sync, so a host/RPC bottleneck is distinguishable from device
execution time.

  python scripts/r5/moe_loop_bisect.py --steps 30 [--config scripts/r4/dit_moe.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--config", default="scripts/r4/dit_moe.json")
    ap.add_argument("--corpus", type=int, default=12800)
    ap.add_argument("--out", default="/tmp/r5/moe_bisect.jsonl")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.data import DeviceCacheLoader, blob_faces_array
    from ddpm_diffusion_model_tpu.models import build_denoiser
    from ddpm_diffusion_model_tpu.ops import make_schedule
    from ddpm_diffusion_model_tpu.training import (
        init_train_state, make_optimizer, make_train_step)
    from ddpm_diffusion_model_tpu.training.loop import train_one_epoch
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    with open(args.config) as f:
        exp = ExperimentConfig.from_json(f.read())
    B = exp.batch_size
    sched = make_schedule(exp.diffusion)
    model = build_denoiser(exp.model, dtype=jnp.bfloat16, remat=exp.remat)
    params = model.init(jax.random.key(0),
                        jnp.ones((1, exp.img_size, exp.img_size, 3)),
                        jnp.zeros((1,)))
    tx = make_optimizer(exp.train)
    state, _ = init_train_state(params, exp.train, tx=tx)
    step_fn = make_train_step(model, sched, tx, exp.train)

    print(f"[corpus] rendering {args.corpus} blobs ...", flush=True)
    corpus_np = blob_faces_array(args.corpus, exp.img_size, seed=0)
    loader = DeviceCacheLoader(corpus_np, B, seed=exp.seed, quantize=True,
                               progress=True)
    corpus_f32 = jnp.asarray(corpus_np, jnp.float32)
    N = args.corpus

    @jax.jit
    def gather(corp, key):
        idx = jax.random.randint(key, (B,), 0, N)
        return jnp.take(corp, idx, axis=0)

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- compile everything once, outside timed regions ----
    print("[compile] step + gathers ...", flush=True)
    t0 = time.perf_counter()
    state, m = step_fn(state, gather(corpus_f32, jax.random.key(1)))
    float(jax.device_get(m["loss"]))
    print(f"[compile] done in {time.perf_counter() - t0:.1f}s", flush=True)
    b0, _ = next(iter(loader))
    state, m = step_fn(state, b0)
    float(jax.device_get(m["loss"]))

    S = args.steps

    def timed(name, fn):
        t0 = time.perf_counter()
        disp, last = fn()
        t_disp = time.perf_counter() - t0
        float(jax.device_get(last))
        t_all = time.perf_counter() - t0
        emit({"variant": name, "steps": S,
              "imgs_per_s": round(S * B / t_all, 1),
              "s_per_step": round(t_all / S, 4),
              "dispatch_s_per_step": round(disp / S, 4) if disp is not None
              else round(t_disp / S, 4)})

    # E: payoff-style direct
    def run_E():
        nonlocal state
        disp = 0.0
        for s in range(S):
            t1 = time.perf_counter()
            state, m = step_fn(state, gather(corpus_f32, jax.random.key(s)))
            disp += time.perf_counter() - t1
        return disp, m["loss"]
    timed("E_direct_fp32_gather", run_E)

    # D: loader's own jitted gather (u8 dequant), bare loop
    def run_D():
        nonlocal state
        disp = 0.0
        rng = np.random.default_rng(0)
        for s in range(S):
            sel = rng.choice(N, B, replace=False)
            t1 = time.perf_counter()
            x = loader._gather(loader.corpus, jnp.asarray(sel))
            state, m = step_fn(state, x)
            disp += time.perf_counter() - t1
        return disp, m["loss"]
    timed("D_loader_gather", run_D)

    # C: loader __iter__, bare loop
    def run_C():
        nonlocal state
        disp = 0.0
        it = iter(loader)
        for s in range(S):
            x, _ = next(it)
            t1 = time.perf_counter()
            state, m = step_fn(state, x)
            disp += time.perf_counter() - t1
        return disp, m["loss"]
    timed("C_loader_iter", run_C)

    # B: loader through device_prefetch
    from ddpm_diffusion_model_tpu.data.loader import device_prefetch

    def run_B():
        nonlocal state
        disp = 0.0
        n = 0
        for x, _ in device_prefetch(iter(loader), size=2):
            if n >= S:
                break
            t1 = time.perf_counter()
            state, m = step_fn(state, x)
            disp += time.perf_counter() - t1
            n += 1
        return disp, m["loss"]
    timed("B_prefetch", run_B)

    # A: the full product path
    def run_A():
        nonlocal state
        state, avg_loss, nb, ni = train_one_epoch(
            step_fn, state, loader, max_batches=S)
        return None, state.step
    timed("A_train_one_epoch", run_A)

    # A2: repeat (steady state, exclude any first-iteration effects)
    timed("A2_train_one_epoch", run_A)

    import os
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
