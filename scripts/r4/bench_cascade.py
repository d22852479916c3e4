"""Cascade (64px base + SR3 upsampler) vs direct 256px — end-to-end
samples/s (VERDICT r3 #2: "the CDM pitch is cheaper 256px; prove or refute
it").

Throughput only — sampler cost does not depend on trained weights, so both
pipelines run random-init params of the PRODUCTION configs:

  cascade:  unet_64x64_config DDIM-50 at 64px  ->  sr64to256 upsampler
            (unet_256x256_config(cond_channels=3)) DDIM-{sr_steps} at 256px
  direct:   unet_256x256_config DDIM-50 at 256px

Both staged entirely on device (the cascade's low->cond resize runs in the
SR program; the only host hop is the one the product's cascade_infer_sample
has between stages — included in the timing, since it is the shipped path).
Analytic MFU from utils/flops.py; one process so tunnel drift cancels.

  python scripts/r4/bench_cascade.py --n 8 --sr-steps 50 --reps 2
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
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--base-steps", type=int, default=50)
    ap.add_argument("--sr-steps", type=int, nargs="+", default=[50],
                    help="SR-stage DDIM steps to sweep (CDM runs the SR "
                         "stage shorter; e.g. 50 20)")
    ap.add_argument("--direct-steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.models import (
        build_denoiser, unet_256x256_config, unet_64x64_config)
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.sampling.inference import _ddim_jit
    from ddpm_diffusion_model_tpu.sampling.superres import (
        _cond_from_low, _upsample_jit)
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule
    from ddpm_diffusion_model_tpu.utils.flops import mfu, sampling_flops

    n = args.n
    key = jax.random.key(0)

    base_cfg = unet_64x64_config()
    base = build_denoiser(base_cfg, dtype=jnp.bfloat16)
    base_sched = make_schedule(DiffusionConfig(T=1000, img_size=64,
                                               dynamic_threshold=0.95))
    base_params = base.init(key, jnp.ones((1, 64, 64, 3)), jnp.zeros((1,)))

    sr_cfg = unet_256x256_config(cond_channels=3)
    sr = build_denoiser(sr_cfg, dtype=jnp.bfloat16)
    sr_sched = make_schedule(DiffusionConfig(T=1000, img_size=256,
                                             dynamic_threshold=0.995))
    sr_params = sr.init(key, jnp.ones((1, 256, 256, 3)), jnp.zeros((1,)),
                        x_cond=jnp.ones((1, 256, 256, 3)))

    d_cfg = unet_256x256_config()
    direct = build_denoiser(d_cfg, dtype=jnp.bfloat16)
    d_params = direct.init(key, jnp.ones((1, 256, 256, 3)), jnp.zeros((1,)))

    ts_base = tuple(int(t) for t in
                    build_ddim_schedule("t_linear", args.base_steps, 1000))
    ts_d = tuple(int(t) for t in
                 build_ddim_schedule("t_linear", args.direct_steps, 1000))

    def run_cascade(seed, ts_sr):
        low, _ = _ddim_jit(base, base_params, base_sched,
                           jax.random.key(seed), (n, 64, 64, 3),
                           ts_base, 0.0, None)
        # the product path (cascade_infer_sample) hops low01 through the
        # host between stages; reproduce it so the timing is end-to-end
        low01 = np.asarray(jnp.clip((low + 1.0) * 0.5, 0.0, 1.0))
        cond = _cond_from_low(sr, jnp.asarray(low01 * 2.0 - 1.0), n)
        return _upsample_jit(sr, sr_params, sr_sched, cond,
                             jax.random.key(seed + 1), ts_sr, 0.0)

    def run_direct(seed):
        x, _ = _ddim_jit(direct, d_params, d_sched, jax.random.key(seed),
                         (n, 256, 256, 3), ts_d, 0.0, None)
        return x

    d_sched = make_schedule(DiffusionConfig(T=1000, img_size=256,
                                            dynamic_threshold=0.995))

    jobs = [(f"cascade_64x{args.base_steps}_to_256x{s}",
             (lambda seed, ts=tuple(int(t) for t in build_ddim_schedule(
                 "t_linear", s, 1000)): run_cascade(seed, ts)),
             sampling_flops(base_cfg, 1, args.base_steps)
             + sampling_flops(sr_cfg, 1, s))
            for s in args.sr_steps]
    jobs.append((f"direct_256x{args.direct_steps}", run_direct,
                 sampling_flops(d_cfg, 1, args.direct_steps)))

    for name, fn, flops in jobs:
        x = fn(1)
        np.asarray(x)  # compile + drain
        t0 = time.perf_counter()
        for r in range(args.reps):
            x = fn(10 + 2 * r)
            jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({
            "pipeline": name, "n": n,
            "samples_per_s": round(n / dt, 3),
            "tflop_per_sample": round(flops / 1e12, 3),
            "mfu_v5e": round(mfu(n * flops, dt), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
