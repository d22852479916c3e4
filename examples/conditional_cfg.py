"""Classifier-free guidance demo + quantitative check (labeled blob faces).

Trains nothing: point it at a checkpoint produced by e.g.

    python -m ddpm_diffusion_model_tpu.cli train --config cond.json \
        --data blobs --preload --ckpt-dir ck

where ``cond.json`` sets ``model.num_classes = K`` (the labeled blob source
renders class k with background hue k/K — data/synthetic.py).  For every
class this samples a guided batch, measures the generated background color
(top image rows), and classifies it against the K class anchor hues.  A
trained conditional model should score K/K at guidance >= 1 and ~chance at
guidance 0 (unconditional).  Prints one JSON line; optionally saves a grid
(rows = classes, guidance left->right) as the visual artifact.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

from ddpm_diffusion_model_tpu.cli import _exp_from_args, _load_state
from ddpm_diffusion_model_tpu.data.synthetic import _class_hue_rgb


def classify_bg(x01: np.ndarray, num_classes: int) -> np.ndarray:
    """Nearest class-anchor hue of each image's top-row mean color."""
    anchors = np.stack([_class_hue_rgb(k, num_classes)
                        for k in range(num_classes)])  # (K, 3)
    top = x01[:, : x01.shape[1] // 8].mean(axis=(1, 2))  # (N, 3) in [0,1]
    d = np.linalg.norm(top[:, None] - anchors[None], axis=-1)
    return np.argmin(d, axis=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config")
    # placeholder default: the checkpoint's meta sidecar carries the real
    # experiment config and overrides the preset in _exp_from_args
    ap.add_argument("--preset", default="celeba64_low")
    ap.add_argument("--n", type=int, default=6, help="samples per class")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, nargs="+",
                    default=[0.0, 1.0, 3.0])
    ap.add_argument("--out", default="cfg_grid.png")
    args = ap.parse_args(argv)

    exp = _exp_from_args(args)
    model, sched, state, _ = _load_state(args.ckpt, exp)
    K = int(getattr(exp.model, "num_classes", 0))
    if not K:
        raise SystemExit("checkpoint is unconditional (num_classes == 0)")

    result = {"num_classes": K, "n_per_class": args.n}
    from ddpm_diffusion_model_tpu.sampling.inference import (
        _ddim_jit, _label_vector)
    from ddpm_diffusion_model_tpu.sampling.loops import to_unit_interval
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule
    import jax

    ts = tuple(int(t) for t in build_ddim_schedule(
        "t_linear", args.steps, sched.T,
        alphas_cumprod=np.asarray(sched.alphas_cumprod)))
    y = np.repeat(np.arange(K, dtype=np.int32), args.n)
    x01 = None  # unit-interval samples from the LAST guidance value
    for w in args.guidance:
        x, _ = _ddim_jit(
            model, state.ema_params, sched, jax.random.key(1234),
            (K * args.n, exp.img_size, exp.img_size, 3), ts, 0.0, None,
            y=_label_vector(y, K * args.n), guidance=float(w))
        x01 = np.asarray(to_unit_interval(x))
        pred = classify_bg(x01, K)
        acc = float((pred == y).mean())
        result[f"acc_guidance_{w:g}"] = round(acc, 4)

    if args.out and x01 is not None:
        from ddpm_diffusion_model_tpu.utils.images import make_grid, save_image

        # artifact: rows = classes at the LAST guidance value (reuses the
        # loop's final pass — same key/labels/ladder, no extra sampling)
        save_image(make_grid(x01, nrow=args.n), args.out)
        result["grid"] = args.out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
