"""Benchmark: training throughput (imgs/s) on the reference's headline config.

Measures the 64x64 attention U-Net (base 128, mults (1,2,2,2), 2 resblocks,
attn {16,8}, 4 heads x 64), batch 128, bf16 — the config of BASELINE.md row 3
(reference: 246-266 imgs/s on a Colab GPU).  Prints ONE JSON line.

Usage: python bench.py [--config attn|low|hq256] [--steps N]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np  # noqa: E402

BASELINES = {
    # midpoints of BASELINE.md throughput rows
    "attn": 256.0,   # row 3: 246-266 imgs/s, batch 128
    "low": 362.0,    # row 1: 345-379 imgs/s, batch 32
    "hq256": 32.0,   # row 4: 31.3-32.8 imgs/s, batch 8 x accum 8
    # beyond-reference DiT-S/4 family on the SAME 64px/batch-128 workload as
    # the attention row (32.5M vs 31.3M params) — vs_baseline compares
    # against the reference's only architecture for that task
    "dit": 256.0,
    # MoE-DiT-S/4 (8 experts, switch top-1): same task/batch, ~103M params
    "dit_moe": 256.0,
    # 64px latent diffusion (unet_latent16_config on f=4 VAE latents): the
    # SAME 64px-generation task as the attention row, so vs_baseline shows
    # the LDM compute trade.  Counts the denoiser only — the VAE encode is
    # once-per-corpus, the decode once per sampled grid.
    "latent": 256.0,
}


def bench_sampling(args):
    """samples/s for DDPM-1000 and DDIM-50 (the reference's quality
    reference points, BASELINE.md row 10).  ``--config hq256`` measures the
    256px flagship inference workload (``ddpim_inference.py:19-21`` defaults,
    the ``inference_256celeba/`` galleries); ``--batch`` overrides the grid
    size (64px default 36 — the reference's 6x6 grid; 256px default 8)."""
    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.models import (
        UNetDenoiser,
        unet_256x256_config,
        unet_64x64_config,
        unet_64x64_low_config,
    )
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.sampling.inference import _ddim_jit, _ddpm_jit
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule

    if args.config == "hq256":
        mcfg, res, n, dyn = unet_256x256_config(), 256, 8, 0.995
    elif args.config == "low":
        mcfg, res, n, dyn = unet_64x64_low_config(), 64, 36, None
    elif args.config == "dit":
        from ddpm_diffusion_model_tpu.models import dit_s4_64_config

        mcfg, res, n, dyn = dit_s4_64_config(), 64, 36, None
    elif args.config == "dit_moe":
        from ddpm_diffusion_model_tpu.models import dit_moe_64_config

        mcfg, res, n, dyn = dit_moe_64_config(), 64, 36, None
    elif args.config == "latent":
        # denoiser-only latent sampling (the VAE decode is once per grid;
        # sampling/latent.py fuses it into the same program in the product)
        from ddpm_diffusion_model_tpu.models import unet_latent16_config

        mcfg, res, n, dyn = unet_latent16_config(), 16, 36, None
    else:
        mcfg, res, n, dyn = unet_64x64_config(), 64, 36, None
    if args.batch:
        n = args.batch
    tag = f"_{args.config}_b{n}" if args.config != "attn" or args.batch else ""
    from ddpm_diffusion_model_tpu.models import build_denoiser

    model = build_denoiser(mcfg, dtype=jnp.bfloat16)
    ch = int(getattr(mcfg, "in_channels", 3))
    sched = make_schedule(
        DiffusionConfig(T=1000, img_size=res, dynamic_threshold=dyn,
                        clamp_x0=args.config != "latent"))
    params = model.init(jax.random.key(0), jnp.ones((1, res, res, ch)),
                        jnp.zeros((1,)))
    shape = (n, res, res, ch)
    reps = max(1, args.sample_reps)
    results = {}

    # Timed loops sync with jax.block_until_ready (device completion), not
    # np.asarray: a host fetch of the grid over this machine's TPU tunnel
    # costs hundreds of ms, which is harness transport, not sampler work.
    # The r3 rows fetched per rep — DDPM amortized that over its 21.5 s
    # window (2%) but the 1.6-2.7 s DDIM windows ate 10-25%, which is where
    # most of the "DDIM MFU gap" in docs/BENCH.md came from.  One np.asarray
    # after each timed region still round-trips the pixels for a finiteness
    # check; --fetch-per-rep reproduces the old fetch-included numbers.
    sync = np.asarray if args.fetch_per_rep else jax.block_until_ready

    if args.sampler in ("ddpm", "both"):
        key = jax.random.key(1)
        x, _ = _ddpm_jit(model, params, sched, key, shape, None, None)  # compile
        np.asarray(x)  # true sync
        t0 = time.perf_counter()
        x, _ = _ddpm_jit(model, params, sched, jax.random.key(2), shape, None, None)
        sync(x)
        results["ddpm1000_samples_per_s"] = n / (time.perf_counter() - t0)
        assert np.isfinite(np.asarray(x)).all()

    if args.sampler in ("ddim", "both"):
        ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 50, 1000))
        x, _ = _ddim_jit(model, params, sched, jax.random.key(3), shape, ts, 0.0, None)
        np.asarray(x)  # true sync
        t0 = time.perf_counter()
        for _ in range(reps):
            x, _ = _ddim_jit(model, params, sched, jax.random.key(4), shape, ts, 0.0, None)
            sync(x)
        results["ddim50_samples_per_s"] = reps * n / (time.perf_counter() - t0)
        assert np.isfinite(np.asarray(x)).all()

    if args.sampler in ("dpmpp", "both"):
        # DPM-Solver++(2M), 20 steps — DDIM-50-quality grids at 2.5x fewer
        # model evals (sampling/solvers.py)
        from ddpm_diffusion_model_tpu.sampling.inference import _dpmpp_jit

        ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 20, 1000))
        x = _dpmpp_jit(model, params, sched, jax.random.key(7), shape, ts)
        np.asarray(x)  # true sync
        t0 = time.perf_counter()
        for _ in range(reps):
            x = _dpmpp_jit(model, params, sched, jax.random.key(8), shape, ts)
            sync(x)
        results["dpmpp20_samples_per_s"] = reps * n / (time.perf_counter() - t0)
        assert np.isfinite(np.asarray(x)).all()

    if args.sampler in ("fast", "both") and args.config.startswith("dit"):
        # encoder-cached sampling is U-Net-only (DiT has no encoder/decoder
        # split); crashing here would discard the timings measured above
        if args.sampler == "fast":
            print(json.dumps({"metric": "ddim50_cached_samples_per_s" + tag,
                              "value": None, "unit": "samples/s",
                              "vs_baseline": None,
                              "note": "encoder-cached sampler is U-Net-only"}))
    elif args.sampler in ("fast", "both"):
        # encoder-cached DDIM-50 (sampling/fast.py), refresh every 2nd step
        from ddpm_diffusion_model_tpu.sampling.fast import _ddim_cached_jit

        ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 50, 1000))
        x = _ddim_cached_jit(model, params, sched, jax.random.key(5), shape,
                             ts, 0.0, 2)
        np.asarray(x)  # true sync
        t0 = time.perf_counter()
        for _ in range(reps):
            x = _ddim_cached_jit(model, params, sched, jax.random.key(6),
                                 shape, ts, 0.0, 2)
            sync(x)
        results["ddim50_cached_samples_per_s"] = reps * n / (time.perf_counter() - t0)
        assert np.isfinite(np.asarray(x)).all()

    from ddpm_diffusion_model_tpu.utils.flops import mfu, sampling_flops

    for k, v in results.items():
        row = {"metric": k + tag, "value": round(v, 3),
               "unit": "samples/s", "vs_baseline": None}
        # honest MFU for the fixed-step samplers (the cached sampler skips
        # encoder work on reuse steps, so its analytic FLOPs differ)
        steps = {"ddpm1000_samples_per_s": 1000,
                 "ddim50_samples_per_s": 50,
                 "dpmpp20_samples_per_s": 20}.get(k)
        if steps is not None:
            per_img_flops = sampling_flops(mcfg, 1, steps)
            row["mfu_v5e"] = round(mfu(int(v * per_img_flops), 1.0), 3)
        print(json.dumps(row))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="attn", choices=list(BASELINES))
    ap.add_argument("--mode", default="train", choices=["train", "sample"])
    ap.add_argument("--sampler", default="both",
                    choices=["ddpm", "ddim", "dpmpp", "fast", "both"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--fetch-per-rep", action="store_true",
                    help="--mode sample: include a host fetch of the grid in "
                         "every timed rep (pre-r3c methodology; measures the "
                         "tunnel transport on this machine, not the sampler)")
    ap.add_argument("--sample-reps", type=int, default=3,
                    help="timed repetitions per sampler in --mode sample")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, help="override batch size")
    ap.add_argument("--accum", type=int, help="override grad-accum steps")
    ap.add_argument("--attn", choices=["auto", "xla", "pallas", "ring"],
                    default="auto",
                    help="attention dispatch override (pallas avoids "
                         "materializing fp32 probs for the backward — the "
                         "memory lever for transformer configs)")
    ap.add_argument("--remat", choices=["on", "off", "masks", "dots", "attn"],
                    help="override remat ('masks' = targeted policy that "
                         "regenerates only dropout bits in the backward; "
                         "'dots'/'attn' [DiT] = save dense outputs / "
                         "checkpoint only the SDPA call)")
    ap.add_argument("--fused-gn", action="store_true",
                    help="tiled Pallas GN+SiLU+time-bias epilogue")
    ap.add_argument("--dropout-impl", choices=["packed", "flax"],
                    help="ResBlock mask impl (default: model default)")
    ap.add_argument("--step-tail", choices=["flat", "tree"],
                    help="EMA lerp + grad-norm metric on one raveled vector "
                         "(flat) vs ~300 leaf kernels (tree, the measured "
                         "winner and TrainConfig default)")
    ap.add_argument("--dropout-rng", choices=["rbg", "threefry"],
                    help="dropout key family (default: TrainConfig default)")
    args = ap.parse_args()

    from ddpm_diffusion_model_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    if args.mode == "sample":
        return bench_sampling(args)

    from ddpm_diffusion_model_tpu.models import (
        UNetDenoiser,
        unet_256x256_config,
        unet_64x64_config,
        unet_64x64_low_config,
    )
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    if args.config == "attn":
        mcfg, res, batch, accum, ema = unet_64x64_config(), 64, 128, 1, 0.9997
        metric = "train_imgs_per_s_celeba64_attn"
    elif args.config == "dit":
        from ddpm_diffusion_model_tpu.models import dit_s4_64_config

        mcfg, res, batch, accum, ema = dit_s4_64_config(), 64, 128, 1, 0.9997
        metric = "train_imgs_per_s_celeba64_dit_s4"
    elif args.config == "dit_moe":
        from ddpm_diffusion_model_tpu.models import dit_moe_64_config

        mcfg, res, batch, accum, ema = dit_moe_64_config(), 64, 128, 1, 0.9997
        metric = "train_imgs_per_s_celeba64_dit_moe"
    elif args.config == "low":
        mcfg, res, batch, accum, ema = unet_64x64_low_config(), 64, 32, 1, 0.9995
        metric = "train_imgs_per_s_celeba64_low"
    elif args.config == "latent":
        from ddpm_diffusion_model_tpu.models import unet_latent16_config

        mcfg, res, batch, accum, ema = unet_latent16_config(), 16, 128, 1, 0.9997
        metric = "train_imgs_per_s_celeba64_latent"
    else:
        # effective batch 64 like the reference (8 x accum 8); micro-16 x 4
        # with remat off measured fastest on one v5e (112 vs 98 imgs/s)
        mcfg, res, batch, accum, ema = unet_256x256_config(), 256, 64, 4, 0.9997
        metric = "train_imgs_per_s_celebahq256"

    if args.batch:
        batch = args.batch
    if args.accum:
        accum = args.accum
    if args.remat in ("masks", "dots", "attn"):
        use_remat = args.remat
    elif args.remat is None:
        # both DiT configs OOM at batch 128 without remat (dense: 16.8G —
        # fp32 SDPA probs; MoE: 20.7G — per-layer expert activations) and
        # block remat beats every fitting alternative measured
        # (docs/BENCH.md "DiT family"); the U-Net stays remat-free
        use_remat = args.config.startswith("dit")
    else:
        use_remat = args.remat == "on"
    model_kw = {}
    if not args.config.startswith("dit"):  # UNet-only constructor knobs
        model_kw["fused_gn"] = args.fused_gn
        if args.dropout_impl:
            model_kw["dropout_impl"] = args.dropout_impl
    from ddpm_diffusion_model_tpu.models import build_denoiser

    model = build_denoiser(mcfg, dtype=jnp.bfloat16, remat=use_remat,
                           attn_impl=args.attn, **model_kw)
    dyn = 0.995 if args.config == "hq256" else None
    sched = make_schedule(
        DiffusionConfig(T=1000, schedule="linear", img_size=res, dynamic_threshold=dyn)
    )
    tcfg_kw = {}
    if args.dropout_rng:
        tcfg_kw["dropout_rng_impl"] = args.dropout_rng
    if args.step_tail:
        tcfg_kw["flat_step_tail"] = args.step_tail == "flat"
    tcfg = TrainConfig(
        base_lr=2e-4, warmup_steps=1000, grad_accum_steps=accum, ema_decay=ema,
        **tcfg_kw
    )

    ch = int(getattr(mcfg, "in_channels", 3))
    params = model.init(
        jax.random.key(0), jnp.ones((1, res, res, ch)), jnp.zeros((1,))
    )
    tx = make_optimizer(tcfg)
    state, _ = init_train_state(params, tcfg, tx=tx)
    train_step = make_train_step(model, sched, tx, tcfg)

    rng = np.random.default_rng(0)
    batch_np = rng.normal(size=(batch, res, res, ch)).astype(np.float32) * 0.5
    x = jnp.asarray(batch_np)

    for _ in range(args.warmup):
        state, metrics = train_step(state, x)
    float(jax.device_get(metrics["loss"]))  # true sync (block_until_ready can
    #                                         no-op over remote transports)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_step(state, x)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    ips = args.steps * batch / dt
    base = BASELINES[args.config]

    # honest MFU: analytic FLOPs (utils/flops.py) — XLA's cost_analysis
    # counts a grad-accum scan body once and under-reports by the accum factor
    from ddpm_diffusion_model_tpu.utils.flops import mfu, train_step_flops

    step_flops = train_step_flops(mcfg, batch)
    util = mfu(step_flops, dt / args.steps)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ips, 1),
                "unit": "imgs/s",
                "vs_baseline": round(ips / base, 2),
                "mfu_v5e": round(util, 3),
                "tflop_per_step": round(step_flops / 1e12, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
