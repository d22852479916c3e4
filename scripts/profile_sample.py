"""Per-step decomposition of the DDIM/DDPM samplers, in-graph amortized.

docs/BENCH.md's 256px inference rows showed DDIM-50 at 53-63% MFU vs
DDPM-1000's 79% even though both scans do the same per-step work (one
model fwd + elementwise sampler math).  bench.py's r3 methodology fetched
the grid to host EVERY timed rep, so the short DDIM windows ate a tunnel
transfer the long DDPM window amortized.  This profiler separates the
device-side costs once and for all:

  1. bare model fwd at the sampling batch (the MXU floor),
  2. one full ddim_step / p_sample_step including extract()/threshold
     math and per-step noise (the honest per-step cost),
  3. the real compiled 50/1000-step scan, timed device-side
     (block_until_ready, no per-rep fetch), divided per step.

(1)-(2) isolates the sampler-math overhead; (2)-(3) isolates scan
machinery; bench.py's old numbers minus (3) is the tunnel transport.

Reference workload: /root/reference/src/testing/ddpim_inference.py:19-21
(256px DDIM, the inference_256celeba/ galleries).

Usage: python scripts/profile_sample.py [--config hq256|attn] [--batch N]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="hq256", choices=["hq256", "attn"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=8,
                    help="in-graph scan length for components")
    ap.add_argument("--outer", type=int, default=4)
    args = ap.parse_args()

    from ddpm_diffusion_model_tpu.models import (
        UNetDenoiser, unet_256x256_config, unet_64x64_config,
    )
    from ddpm_diffusion_model_tpu.ops import (
        DiffusionConfig, ddim_step, make_schedule, p_sample_step,
    )
    from ddpm_diffusion_model_tpu.sampling.inference import _ddim_jit, _ddpm_jit
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule
    from ddpm_diffusion_model_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )
    from ddpm_diffusion_model_tpu.utils.flops import unet_fwd_flops

    enable_compilation_cache()
    if args.config == "hq256":
        mcfg, res, B, dyn = unet_256x256_config(), 256, args.batch or 8, 0.995
    else:
        mcfg, res, B, dyn = unet_64x64_config(), 64, args.batch or 36, None
    model = UNetDenoiser(mcfg, dtype=jnp.bfloat16)
    sched = make_schedule(
        DiffusionConfig(T=1000, img_size=res, dynamic_threshold=dyn))
    params = model.init(jax.random.key(0), jnp.ones((1, res, res, 3)),
                        jnp.zeros((1,)))
    shape = (B, res, res, 3)
    x0 = jax.random.normal(jax.random.key(1), shape, dtype=jnp.float32)
    fwd_flops = unet_fwd_flops(mcfg, B)
    print(f"backend={jax.default_backend()} config={args.config} batch={B}",
          flush=True)

    R = args.repeats

    def graph_repeat_ms(body):
        @jax.jit
        def run(x):
            def step(c, i):
                return body(c, i), None
            c, _ = jax.lax.scan(step, x, jnp.arange(R))
            return c

        for _ in range(2):
            out = jax.block_until_ready(run(x0))
        t0 = time.perf_counter()
        for _ in range(args.outer):
            out = jax.block_until_ready(run(x0))
        return (time.perf_counter() - t0) / args.outer / R * 1e3

    # 1. bare model fwd (timestep fixed mid-schedule; data-dep via carry)
    def bare_fwd(x, i):
        t = jnp.full((B,), 500, jnp.int32)
        eps = model.apply(params, x.astype(jnp.bfloat16), t)
        return x + 1e-6 * eps.astype(x.dtype)

    ms_fwd = graph_repeat_ms(bare_fwd)
    print(f"bare model fwd      {ms_fwd:8.2f} ms  "
          f"{fwd_flops / ms_fwd / 1e9:6.1f} TFLOP/s "
          f"({fwd_flops / ms_fwd / 1e9 / 197 * 100:.1f}% MFU)", flush=True)

    # 2. one full sampler step (model + extract/threshold math + noise)
    eps_fn = lambda xt, t: model.apply(params, xt, t)
    key = jax.random.key(2)

    def full_ddim(x, i):
        t = jnp.full((B,), 500, jnp.int32)
        t_prev = jnp.full((B,), 480, jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(key, i), shape, x.dtype)
        return ddim_step(sched, eps_fn, x, t, t_prev, noise, eta=0.0,
                         clip_x0=True)

    ms_ddim = graph_repeat_ms(full_ddim)
    print(f"full ddim_step      {ms_ddim:8.2f} ms  "
          f"(+{ms_ddim - ms_fwd:.2f} ms sampler math+noise)", flush=True)

    def full_ddpm(x, i):
        t = jnp.full((B,), 500, jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(key, i), shape, x.dtype)
        return p_sample_step(sched, eps_fn, x, t, noise)

    ms_ddpm = graph_repeat_ms(full_ddpm)
    print(f"full p_sample_step  {ms_ddpm:8.2f} ms  "
          f"(+{ms_ddpm - ms_fwd:.2f} ms sampler math+noise)", flush=True)

    # 3. the real compiled scans, device-side timing
    ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 50, 1000))
    out, _ = _ddim_jit(model, params, sched, jax.random.key(3), shape, ts,
                       0.0, None)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        out, _ = _ddim_jit(model, params, sched, jax.random.key(4 + r),
                           shape, ts, 0.0, None)
        jax.block_until_ready(out)
    ddim_scan_ms = (time.perf_counter() - t0) / reps / 50 * 1e3
    print(f"DDIM-50 scan/step   {ddim_scan_ms:8.2f} ms  "
          f"-> {B / (ddim_scan_ms * 50 / 1e3):.2f} samples/s device-side "
          f"({fwd_flops / ddim_scan_ms / 1e9 / 197 * 100:.1f}% MFU)",
          flush=True)

    # one host fetch, timed, to quantify the tunnel transport bench.py r3
    # was accidentally charging to every DDIM rep
    t0 = time.perf_counter()
    np.asarray(out)
    fetch_ms = (time.perf_counter() - t0) * 1e3
    mb = out.size * out.dtype.itemsize / 1e6
    print(f"host fetch of grid  {fetch_ms:8.1f} ms  ({mb:.1f} MB)", flush=True)

    out, _ = _ddpm_jit(model, params, sched, jax.random.key(9), shape,
                       None, None)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out, _ = _ddpm_jit(model, params, sched, jax.random.key(10), shape,
                       None, None)
    jax.block_until_ready(out)
    ddpm_scan_ms = (time.perf_counter() - t0) / 1000 * 1e3
    print(f"DDPM-1000 scan/step {ddpm_scan_ms:8.2f} ms  "
          f"-> {B / (ddpm_scan_ms * 1000 / 1e3):.3f} samples/s device-side "
          f"({fwd_flops / ddpm_scan_ms / 1e9 / 197 * 100:.1f}% MFU)",
          flush=True)


if __name__ == "__main__":
    main()
