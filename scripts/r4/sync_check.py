"""Settle the block_until_ready-vs-host-fetch contradiction (VERDICT r3 #3).

docs/BENCH.md (pre-r3c) and scripts/profile256.py claimed
``jax.block_until_ready`` can return without waiting on this machine's
tunneled TPU transport; bench.py's r3b methodology fix assumed the
opposite.  One experiment decides it:

  For DDIM-50 at two batch sizes (16, 32), time
    (a) the sampler with block_until_ready as the only sync, and
    (b) the sampler + an np.asarray host fetch, with the fetch ALSO timed
        separately immediately after a block_until_ready sync.

  If block_until_ready is a real device sync, then across batch sizes
  (a) scales ~linearly with analytic FLOPs, and (a) + fetch_time ≈ (b).
  If it no-ops, (a) is near-zero / flat in batch and (b) - (a) >> the
  separately-timed fetch.

Run on the real chip:  python scripts/r4/sync_check.py [--config attn|hq256]
Emits one JSON line per measurement and a verdict line.
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
    ap.add_argument("--config", default="attn", choices=["attn", "hq256"])
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.models import (
        build_denoiser, unet_256x256_config, unet_64x64_config)
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.sampling.inference import _ddim_jit
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule
    from ddpm_diffusion_model_tpu.utils.flops import sampling_flops

    if args.config == "hq256":
        mcfg, res, dyn = unet_256x256_config(), 256, 0.995
    else:
        mcfg, res, dyn = unet_64x64_config(), 64, None
    model = build_denoiser(mcfg, dtype=jnp.bfloat16)
    sched = make_schedule(DiffusionConfig(T=1000, img_size=res,
                                          dynamic_threshold=dyn))
    params = model.init(jax.random.key(0), jnp.ones((1, res, res, 3)),
                        jnp.zeros((1,)))
    ts = tuple(int(t) for t in
               build_ddim_schedule("t_linear", args.steps, 1000))

    rows = []
    for n in args.batches:
        shape = (n, res, res, 3)
        x, _ = _ddim_jit(model, params, sched, jax.random.key(1), shape,
                         ts, 0.0, None)
        np.asarray(x)  # compile + drain

        # (a) block_until_ready-only timing
        t0 = time.perf_counter()
        for r in range(args.reps):
            x, _ = _ddim_jit(model, params, sched, jax.random.key(2 + r),
                             shape, ts, 0.0, None)
            jax.block_until_ready(x)
        t_sync = (time.perf_counter() - t0) / args.reps

        # fetch timed separately right after a sync (pure transport)
        t1 = time.perf_counter()
        np.asarray(x)
        t_fetch = time.perf_counter() - t1

        # (b) fetch-included timing (fresh dispatches)
        t2 = time.perf_counter()
        for r in range(args.reps):
            x, _ = _ddim_jit(model, params, sched, jax.random.key(20 + r),
                             shape, ts, 0.0, None)
            np.asarray(x)
        t_total = (time.perf_counter() - t2) / args.reps

        flops = sampling_flops(mcfg, n, args.steps)
        row = {"batch": n, "t_sync_s": round(t_sync, 4),
               "t_fetch_s": round(t_fetch, 4),
               "t_fetch_included_s": round(t_total, 4),
               "sync_plus_fetch_s": round(t_sync + t_fetch, 4),
               "tflop": round(flops / 1e12, 2),
               "tflops_per_s_sync": round(flops / t_sync / 1e12, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        flop_ratio = b["tflop"] / a["tflop"]
        time_ratio = b["t_sync_s"] / a["t_sync_s"]
        # additivity: does sync + separately-timed fetch predict the
        # fetch-included loop?
        add_err = max(abs(r["sync_plus_fetch_s"] - r["t_fetch_included_s"])
                      / r["t_fetch_included_s"] for r in rows)
        reliable = (0.7 * flop_ratio <= time_ratio <= 1.3 * flop_ratio
                    and add_err < 0.15)
        print(json.dumps({
            "verdict": "block_until_ready_reliable" if reliable
                       else "block_until_ready_SUSPECT",
            "flop_ratio": round(flop_ratio, 3),
            "sync_time_ratio": round(time_ratio, 3),
            "additivity_max_rel_err": round(add_err, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
