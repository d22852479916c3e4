"""Super-resolution cascade demo + quantitative checks (blob faces).

Trains nothing: point it at two checkpoints produced by e.g.

    # conditional base at 32px
    python -m ddpm_diffusion_model_tpu.cli train --config base32.json \
        --data blobs --preload --ckpt-dir ck
    # SR upsampler 32->64 (cond_channels=3, superres_factor=2)
    python -m ddpm_diffusion_model_tpu.cli train --config sr64.json \
        --data blobs --preload --ckpt-dir ck

Two measurements, one JSON line:

1. **SR fidelity**: render ground-truth blob faces at the SR model's
   resolution, degrade them by the training factor, super-resolve the
   low-res views, and report PSNR vs the ground truth — against the plain
   bilinear-upsample baseline the SR model must beat.  Saves a
   low/SR/ground-truth triptych grid.
2. **Class control through the cascade**: for each guidance value, run the
   two-stage cascade with class-cycled labels on the BASE stage and
   classify the final HIGH-RES outputs by background hue
   (examples/conditional_cfg.py scoring).  Accuracy at the top resolution
   shows base-stage CFG steering survives super-resolution — the capability
   the reference's two unrelated unconditional models cannot express.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

from ddpm_diffusion_model_tpu.cli import _exp_from_args, _load_state


def psnr(a01: np.ndarray, b01: np.ndarray) -> float:
    mse = float(np.mean((a01 - b01) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="SR upsampler checkpoint")
    ap.add_argument("--base-ckpt", required=True,
                    help="base (low-res) model checkpoint")
    ap.add_argument("--config")
    ap.add_argument("--base-config")
    ap.add_argument("--preset", default="celeba64_low")  # meta overrides
    ap.add_argument("--n", type=int, default=6, help="samples per class")
    ap.add_argument("--fidelity-n", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--base-steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, nargs="+",
                    default=[0.0, 1.0, 3.0])
    ap.add_argument("--out", default="cascade_grid.png")
    ap.add_argument("--out-fidelity", default="sr_triptych.png")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.data.synthetic import blob_faces_array
    from ddpm_diffusion_model_tpu.ops.superres import degrade, upsample_cond
    from ddpm_diffusion_model_tpu.sampling import (
        cascade_infer_sample,
        upsample_infer_sample,
    )
    from ddpm_diffusion_model_tpu.utils.images import (
        grid_nrow,
        make_grid,
        save_image,
    )
    from examples.conditional_cfg import classify_bg

    sr_exp = _exp_from_args(
        argparse.Namespace(config=args.config, preset=args.preset,
                           ckpt=args.ckpt))
    base_exp = _exp_from_args(
        argparse.Namespace(config=args.base_config, preset=args.preset,
                           ckpt=args.base_ckpt))
    sr_model, sr_sched, sr_state, _ = _load_state(args.ckpt, sr_exp)
    base_model, base_sched, base_state, _ = _load_state(
        args.base_ckpt, base_exp)
    factor = int(sr_exp.train.superres_factor)
    res = int(sr_exp.model.img_resolution)
    result = {"factor": factor, "sr_resolution": res,
              "base_resolution": int(base_exp.model.img_resolution)}

    # --- 1. SR fidelity vs the bilinear baseline -------------------------
    m = args.fidelity_n
    truth01 = blob_faces_array(m, img_size=res, seed=7) * 0.5 + 0.5
    low = np.asarray(degrade(jnp.asarray(truth01 * 2.0 - 1.0), factor))
    sr01 = upsample_infer_sample(
        sr_model, sr_state.params, sr_sched, low, n=m, steps=args.steps,
        seed=11, ema_params=sr_state.ema_params, out_path=None)
    bilinear01 = np.clip(
        np.asarray(upsample_cond(jnp.asarray(low), res)) * 0.5 + 0.5, 0, 1)
    result["psnr_sr"] = round(psnr(sr01, truth01), 2)
    result["psnr_bilinear"] = round(psnr(bilinear01, truth01), 2)
    trip = np.concatenate([bilinear01[:8], sr01[:8], truth01[:8]])
    save_image(make_grid(trip, nrow=8), args.out_fidelity)
    result["fidelity_artifact"] = args.out_fidelity

    # --- 2. class control through the cascade ----------------------------
    K = int(getattr(base_exp.model, "num_classes", 0))
    if K:
        y = np.repeat(np.arange(K, dtype=np.int32), args.n)
        for w in args.guidance:
            low01, hi01 = cascade_infer_sample(
                base_model, base_state.ema_params, base_sched,
                sr_model, sr_state.ema_params, sr_sched,
                n=K * args.n, base_steps=args.base_steps,
                sr_steps=args.steps, seed=1234,
                out_path=None, class_id=y, guidance=float(w))
            acc_hi = float((classify_bg(hi01, K) == y).mean())
            acc_lo = float((classify_bg(low01, K) == y).mean())
            result[f"acc_hi_guidance_{w:g}"] = round(acc_hi, 4)
            result[f"acc_lo_guidance_{w:g}"] = round(acc_lo, 4)
        save_image(make_grid(hi01, nrow=grid_nrow(hi01.shape[0])), args.out)
        result["cascade_artifact"] = args.out
    else:
        low01, hi01 = cascade_infer_sample(
            base_model, base_state.ema_params, base_sched,
            sr_model, sr_state.ema_params, sr_sched,
            n=args.n, base_steps=args.base_steps, sr_steps=args.steps,
            seed=1234, out_path=args.out)
        result["cascade_artifact"] = args.out

    print(json.dumps(result))


if __name__ == "__main__":
    main()
