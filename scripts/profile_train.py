"""Throughput experiment matrix for the train step on the current backend.

Usage: python scripts/profile_train.py [--config attn|low] [--steps 10]
Prints one line per variant: attn impl x donate x remat.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def run_variant(name, model, sched, tcfg, batch):
    from ddpm_diffusion_model_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    tx = make_optimizer(tcfg)
    params = model.init(
        jax.random.key(0), jnp.ones((1, *batch.shape[1:])), jnp.zeros((1,))
    )
    state, _ = init_train_state(params, tcfg, tx=tx)
    step = make_train_step(model, sched, tx, tcfg)
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    ips = args.steps * batch.shape[0] / dt
    print(f"{name:32s} {ips:8.1f} imgs/s   {1e3 * dt / args.steps:7.1f} ms/step")
    return ips


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="attn")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--variant", default="all",
                    choices=["all", "pallas", "xla", "remat", "bigbatch"])
    args = ap.parse_args()

    from ddpm_diffusion_model_tpu.models import (
        UNetDenoiser,
        unet_64x64_config,
        unet_64x64_low_config,
    )
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.training import TrainConfig
    from ddpm_diffusion_model_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend())

    if args.config == "attn":
        cfg, res, B = unet_64x64_config(), 64, 128
    else:
        cfg, res, B = unet_64x64_low_config(), 64, 32

    sched = make_schedule(DiffusionConfig(T=1000, img_size=res))
    tcfg = TrainConfig(grad_accum_steps=1)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.normal(size=(B, res, res, 3)).astype(np.float32) * 0.5)

    v = args.variant
    if v in ("all", "pallas"):
        model = UNetDenoiser(cfg, dtype=jnp.bfloat16, attn_impl="pallas")
        run_variant("attn=pallas", model, sched, tcfg, batch)
    if v in ("all", "xla"):
        model = UNetDenoiser(cfg, dtype=jnp.bfloat16, attn_impl="xla")
        run_variant("attn=xla", model, sched, tcfg, batch)
    if v in ("all", "remat"):
        model = UNetDenoiser(cfg, dtype=jnp.bfloat16, remat=True)
        run_variant("remat=True", model, sched, tcfg, batch)
    if v in ("all", "bigbatch"):
        batch2 = jnp.concatenate([batch, batch], axis=0)
        model = UNetDenoiser(cfg, dtype=jnp.bfloat16)
        run_variant(f"batch={2 * B}", model, sched, tcfg, batch2)
