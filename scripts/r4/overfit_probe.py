"""Diagnose the celeba40 overfit run: loss is low but samples are noise.

Loads the final checkpoint ON THE TPU (same platform as the save), then:
  1. eps-MSE / x0_hat error at a grid of t on REAL train images — is the
     network actually denoising its training data?
  2. a DDIM-50 img2img pass at strength 0.5 from a real image — does the
     sampler move toward the data manifold when started ON it?
  3. a from-scratch DDIM-50 grid for comparison.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/r4/ck/celeba40_overfit_last")
    ap.add_argument("--config", default="scripts/r4/celeba40_overfit.json")
    ap.add_argument("--out-prefix", default="/tmp/r4/overfit_probe")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.cli import _exp_from_args, _load_state
    from ddpm_diffusion_model_tpu.data import (
        get_celeba_loader_from_zip, materialize_corpus)
    from ddpm_diffusion_model_tpu.ops.diffusion import (
        model_output_to_eps, predict_x0, q_sample)
    from ddpm_diffusion_model_tpu.sampling.editing import (
        _img2img_jit, truncate_ladder)
    from ddpm_diffusion_model_tpu.sampling.inference import _ddim_jit
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule
    from ddpm_diffusion_model_tpu.utils.images import save_image_grid

    exp = _exp_from_args(argparse.Namespace(
        config=args.config, preset="celeba64_attn", ckpt=args.ckpt))
    model, sched, state, meta = _load_state(args.ckpt, exp)
    print("global_step", meta.get("global_step"), flush=True)

    loader = get_celeba_loader_from_zip("data/celeba_zip", img_size=64,
                                        batch_size=8, seed=0)
    arr = materialize_corpus(loader)[:8]
    x0 = jnp.asarray(arr)

    @jax.jit
    def probe(params, x0, t, key):
        eps = jax.random.normal(key, x0.shape)
        xt = q_sample(sched, x0, t, eps)
        out = model.apply(params, xt, t)
        e_hat = model_output_to_eps(sched, out, xt, t)
        x0h = predict_x0(sched, xt, e_hat, t)
        return (jnp.mean((e_hat - eps) ** 2), jnp.mean((x0h - x0) ** 2),
                x0h.std())

    for tt in (50, 100, 300, 500, 700, 900, 990):
        t = jnp.full((8,), tt, jnp.int32)
        for name, p in (("ema", state.ema_params), ("raw", state.params)):
            a, b, c = jax.device_get(
                probe(p, x0, t, jax.random.key(tt)))
            print(f"t={tt:4d} [{name}] eps_mse={float(a):.4f} "
                  f"x0_err={float(b):.4f} x0h_std={float(c):.3f}",
                  flush=True)

    ts = build_ddim_schedule("t_linear", 50, sched.T,
                             alphas_cumprod=np.asarray(sched.alphas_cumprod))
    half = tuple(int(t) for t in truncate_ladder(ts, 0.5))
    x = _img2img_jit(model, state.ema_params, sched, x0,
                     jax.random.key(7), half, 0.0)
    save_image_grid(np.asarray((x + 1.0) * 0.5).clip(0, 1),
                    args.out_prefix + "_img2img.png", nrow=4)
    print("img2img mse vs init:",
          float(jnp.mean((x - x0) ** 2)), flush=True)

    xf, _ = _ddim_jit(model, state.ema_params, sched, jax.random.key(8),
                      (8, 64, 64, 3), tuple(int(t) for t in ts), 0.0, None)
    save_image_grid(np.asarray((xf + 1.0) * 0.5).clip(0, 1),
                    args.out_prefix + "_scratch.png", nrow=4)
    print("scratch grid std:", float(jnp.std(xf)), flush=True)


if __name__ == "__main__":
    main()
