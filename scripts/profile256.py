"""Attributed step breakdown for the CelebA-HQ-256 train config.

VERDICT round-1 item 1: "Profile one hq256 step and commit the attributed
breakdown to docs/BENCH.md".  The axon tunnel may not support device traces,
so this measures by ABLATION: each component is timed as its own jitted
program at its real shape (micro-batch 16, bf16), synced by host fetches.
(r4 correction: block_until_ready was PROVEN a real device sync on this
transport — scripts/r4/sync_check.py, docs/BENCH.md "Sync methodology
settled (r4)"; the host-fetch syncs here remain valid, just slightly
conservative, and single fetches carry ~100 ms tunnel jitter.)

Components timed:
  - full train step (micro 16 x accum 4)    <- the 569 ms baseline
  - fwd-only loss                           <- isolates backward cost
  - per-level ResBlock fwd+bwd              <- where the time lives
  - bare 3x3 conv fwd at each level         <- MXU roofline anchor
  - GN+SiLU chain at 256^2x128              <- the HBM-bound suspect
  - AttnBlock at 16^2x512
Optionally attempts a real jax.profiler trace (--trace DIR).

Usage: python scripts/profile256.py [--steps 8] [--trace DIR]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    # reduce on device, fetch a scalar — fetching whole activations over the
    # tunnel would dominate the measurement
    leaf = jax.tree.leaves(x)[0]
    return float(jax.device_get(jnp.sum(leaf)))


def grad_sum(g):
    # fold grads into the returned scalar: without this, a jitted
    # value_and_grad whose grads are unused gets its WHOLE backward pass
    # dead-code-eliminated and "fwd+bwd" rows silently measure fwd only
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(g))


def timeit(fn, *args, steps=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--micro", type=int, default=16)
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    from ddpm_diffusion_model_tpu.models import UNetDenoiser, unet_256x256_config
    from ddpm_diffusion_model_tpu.models.blocks import AttnBlock, ResBlock
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.training import (
        TrainConfig, init_train_state, make_optimizer, make_train_step,
    )
    from ddpm_diffusion_model_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    M = args.micro
    print(f"backend={jax.default_backend()} micro={M}", flush=True)

    # ---- per-level shapes of the 256px U-Net (mults 1,1,2,2,4, base 128)
    LEVELS = [
        ("L0 256x256x128", (M, 256, 256, 128), 128),
        ("L1 128x128x128", (M, 128, 128, 128), 128),
        ("L2  64x64x256", (M, 64, 64, 256), 256),
        ("L3  32x32x256", (M, 32, 32, 256), 256),
        ("L4  16x16x512", (M, 16, 16, 512), 512),
    ]

    rows = []

    def report(name, ms, note=""):
        rows.append((name, ms, note))
        print(f"{name:34s} {ms:9.2f} ms  {note}", flush=True)

    # ---- bare conv anchor (fwd): 3x3 same conv, bf16
    for name, shape, ch in LEVELS:
        x = jnp.ones(shape, jnp.bfloat16)
        w = jnp.ones((3, 3, ch, ch), jnp.bfloat16)

        @jax.jit
        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        ms = timeit(conv, x, w, steps=args.steps)
        gflop = 2 * np.prod(shape) * 9 * ch / 1e9
        report(f"conv3x3 fwd {name}", ms,
               f"{gflop / ms:7.1f} TFLOP/s ({gflop:.0f} GFLOP)")

    # ---- per-level ResBlock fwd+bwd (grad wrt x and params)
    t_emb = jnp.ones((M, 512), jnp.float32)
    for name, shape, ch in LEVELS:
        blk = ResBlock(out_ch=ch, dtype=jnp.bfloat16)
        x = jnp.ones(shape, jnp.bfloat16)
        params = blk.init(jax.random.key(0), x, t_emb)

        @jax.jit
        def fwdbwd(params, x):
            def loss(p, xx):
                return jnp.sum(blk.apply(p, xx, t_emb).astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return l + grad_sum(g)

        ms = timeit(fwdbwd, params, x, steps=args.steps)
        report(f"ResBlock fwd+bwd {name}", ms)

    # ---- GN+SiLU chain alone at the two big levels (fwd+bwd)
    for name, shape, ch in LEVELS[:2]:
        from ddpm_diffusion_model_tpu.models.blocks import group_norm

        gn = group_norm(ch, dtype=jnp.bfloat16)
        x = jnp.ones(shape, jnp.bfloat16)
        params = gn.init(jax.random.key(0), x)

        @jax.jit
        def gnloss(params, x):
            def loss(p, xx):
                return jnp.sum(
                    jax.nn.silu(gn.apply(p, xx)).astype(jnp.float32) ** 2
                )
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return l + grad_sum(g)

        ms = timeit(gnloss, params, x, steps=args.steps)
        gb = 2 * np.prod(shape) * 2 / 1e9
        report(f"GN+SiLU fwd+bwd {name}", ms, f"(~{gb:.2f} GB min traffic fwd)")

    # ---- attention at the bottleneck
    attn = AttnBlock(num_heads=4, head_dim=64, dtype=jnp.bfloat16)
    xa = jnp.ones((M, 16, 16, 512), jnp.bfloat16)
    pa = attn.init(jax.random.key(0), xa)

    @jax.jit
    def attnloss(p, x):
        def loss(pp, xx):
            return jnp.sum(attn.apply(pp, xx).astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
        return l + grad_sum(g)

    report("AttnBlock fwd+bwd 16x16x512", timeit(attnloss, pa, xa, steps=args.steps))

    if not args.skip_full:
        # ---- full step + fwd-only
        mcfg = unet_256x256_config()
        model = UNetDenoiser(mcfg, dtype=jnp.bfloat16, remat=False)
        sched = make_schedule(
            DiffusionConfig(T=1000, img_size=256, dynamic_threshold=0.995)
        )
        tcfg = TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=4,
                           ema_decay=0.9997)
        params = model.init(jax.random.key(0), jnp.ones((1, 256, 256, 3)),
                            jnp.zeros((1,)))
        tx = make_optimizer(tcfg)
        state, _ = init_train_state(params, tcfg, tx=tx)
        step = make_train_step(model, sched, tx, tcfg)
        batch = jnp.asarray(
            np.random.default_rng(0).normal(size=(4 * M, 256, 256, 3))
            .astype(np.float32) * 0.5
        )

        def run_step(state, batch):
            state, m = step(state, batch)
            return state, m

        for _ in range(2):
            state, m = run_step(state, batch)
        sync(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = run_step(state, batch)
        sync(m["loss"])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        report("FULL train step (micro16x4)", ms,
               f"{4 * M / (ms / 1e3):6.1f} imgs/s")

        # fwd-only loss (same micro shape, one microbatch)
        from ddpm_diffusion_model_tpu.training.step import make_loss_fn

        loss_fn = jax.jit(make_loss_fn(model, sched))
        xm = batch[:M]
        ms = timeit(lambda: loss_fn(state.params, xm, jax.random.key(1)),
                    steps=args.steps)
        report("fwd-only loss (micro 16)", ms, "x4 micro = fwd share of step")

        if args.trace:
            with jax.profiler.trace(args.trace):
                state, m = run_step(state, batch)
                sync(m["loss"])
            print(f"trace written to {args.trace}", flush=True)

    print("---- summary ----")
    for name, ms, note in rows:
        print(f"{name:34s} {ms:9.2f} ms  {note}")


if __name__ == "__main__":
    main()
