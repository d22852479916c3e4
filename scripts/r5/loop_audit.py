"""Loop-vs-direct audit (VERDICT r4 #9): for each shipped family, measure
the SAME compiled train step driven (a) by a bare dispatch loop and (b) by
the product epoch loop (`train_one_epoch` + DeviceCacheLoader), in one
process, so "bench number == product number" is a checked invariant.

Context: r4 recorded MoE-DiT at 56 imgs/s through the CLI loop vs 950
direct and flagged the glue.  The r5 bisect + a clean CLI rerun showed the
glue adds <1% (the r4 number was a degraded-tunnel session); this audit
pins that for every family.

  python scripts/r5/loop_audit.py --steps 30 [--families low,attn,dit,moe,latent,hq256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

FAMILIES = ("low", "attn", "dit", "moe", "latent", "hq256")


def build(family):
    """-> (model, sched, tcfg, batch_size, img, channels)"""
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.models import build_denoiser
    from ddpm_diffusion_model_tpu.ops import make_schedule
    from ddpm_diffusion_model_tpu.utils.config import get_preset

    name = {"low": "celeba64_low", "attn": "celeba64_attn",
            "dit": "celeba64_dit_s4", "moe": "celeba64_dit_moe",
            "latent": "celeba64_latent", "hq256": "celebahq256"}[family]
    exp = get_preset(name)
    # dit/moe need block remat at batch 128 (docs/BENCH.md r3c: no-remat
    # OOMs — 16.8G > 15.75G saving the fp32 SDPA probs)
    remat = exp.remat or family in ("dit", "moe")
    model = build_denoiser(exp.model, dtype=jnp.bfloat16, remat=remat)
    sched = make_schedule(exp.diffusion)
    ch = int(getattr(exp.model, "in_channels", 3))
    return model, sched, exp.train, exp.batch_size, exp.img_size, ch


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--families", default="low,attn,dit,moe,latent")
    ap.add_argument("--corpus", type=int, default=2048)
    ap.add_argument("--out", default="/tmp/r5/loop_audit.jsonl")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.data import DeviceCacheLoader
    from ddpm_diffusion_model_tpu.training import (
        init_train_state, make_optimizer, make_train_step)
    from ddpm_diffusion_model_tpu.training.loop import train_one_epoch

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    outf = open(args.out, "a")

    def emit(row):
        line = json.dumps(row)
        print(line, flush=True)
        outf.write(line + "\n")
        outf.flush()

    S = args.steps
    for family in args.families.split(","):
        family = family.strip()
        model, sched, tcfg, B, img, ch = build(family)
        N = max(args.corpus, B * (S + 2))
        # latent corpora are unbounded 4-channel latents; pixels are [-1,1]
        rng = np.random.default_rng(0)
        corpus = np.clip(rng.normal(scale=0.5, size=(N, img, img, ch)),
                         -1, 1).astype(np.float32)
        loader = DeviceCacheLoader(corpus, B, seed=0, quantize=(ch == 3))
        del corpus

        params = model.init(jax.random.key(0), jnp.ones((1, img, img, ch)),
                            jnp.zeros((1,)))
        tx = make_optimizer(tcfg)
        state, _ = init_train_state(params, tcfg, tx=tx)
        step = make_train_step(model, sched, tx, tcfg)

        print(f"[{family}] compiling ...", flush=True)
        t0 = time.perf_counter()
        b0, _ = next(iter(loader))
        state, m = step(state, b0)
        float(jax.device_get(m["loss"]))
        t_compile = time.perf_counter() - t0

        # (a) direct: bare dispatch loop over loader batches
        it = iter(loader)
        t0 = time.perf_counter()
        for s in range(S):
            x, _ = next(it)
            state, m = step(state, x)
        float(jax.device_get(m["loss"]))
        direct = S * B / (time.perf_counter() - t0)

        # (b) product: the epoch loop (prefetch, loss accumulation, hooks)
        t0 = time.perf_counter()
        state, avg_loss, nb, ni = train_one_epoch(step, state, loader,
                                                  max_batches=S)
        loop = ni / (time.perf_counter() - t0)

        emit({"family": family, "batch": B, "img": img,
              "direct_imgs_per_s": round(direct, 1),
              "loop_imgs_per_s": round(loop, 1),
              "loop_over_direct": round(loop / direct, 4),
              "compile_s": round(t_compile, 1), "steps": S})
        # free HBM before the next family
        del state, step, loader, params, tx
        import gc
        gc.collect()
    outf.close()


if __name__ == "__main__":
    main()
