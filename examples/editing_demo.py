"""Image-editing demo + quantitative check (img2img / inpaint, labeled blobs).

Trains nothing: point it at a CONDITIONAL checkpoint (``model.num_classes =
K``; see ``examples/conditional_cfg.py`` for how to train one).  Two
falsifiable experiments against real dataset images (not samples):

1. **img2img strength sweep** — edit the same blob face at several
   strengths; reports MSE-to-init per strength (must be monotone: the
   strength knob is the faithfulness dial) and saves a strip
   (rows = strengths, cols = variations).
2. **inpaint class swap** — keep the face (center box) EXACTLY, regenerate
   the background conditioned on a DIFFERENT class with CFG.  The blob
   label is the background hue (data/synthetic.py), so success is
   measurable: the regenerated background must classify as the requested
   class while the kept pixels stay bit-identical.  Reports swap accuracy
   over all classes + the exact-paste check.

Prints one JSON line; saves grids as visual artifacts.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

from ddpm_diffusion_model_tpu.cli import _exp_from_args, _load_state
from ddpm_diffusion_model_tpu.data.synthetic import BlobFacesDataset
from examples.conditional_cfg import classify_bg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config")
    ap.add_argument("--preset", default="celeba64_low")  # meta overrides
    ap.add_argument("--n", type=int, default=4, help="variations / per-class")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--strengths", type=float, nargs="+",
                    default=[0.2, 0.5, 0.8])
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--resamples", type=int, default=2)
    ap.add_argument("--out-img2img", default="img2img_strip.png")
    ap.add_argument("--out-inpaint", default="inpaint_classswap.png")
    args = ap.parse_args(argv)

    exp = _exp_from_args(args)
    model, sched, state, _ = _load_state(args.ckpt, exp)
    K = int(getattr(exp.model, "num_classes", 0))
    if not K:
        raise SystemExit("demo needs a conditional checkpoint "
                         "(num_classes > 0) for the inpaint class swap")

    from ddpm_diffusion_model_tpu.sampling import (
        box_mask, img2img_infer_sample, inpaint_infer_sample)
    from ddpm_diffusion_model_tpu.utils.images import make_grid, save_image

    S = exp.img_size
    ds = BlobFacesDataset(n=K * 4, img_size=S, seed=3, num_classes=K)
    result = {"num_classes": K, "steps": args.steps}

    # ---- 1. img2img strength sweep on one real class-0 image -------------
    init, y0 = ds[0]  # class 0, [-1,1]
    rows, mses = [], {}
    for s in args.strengths:
        out01 = img2img_infer_sample(
            model, state.params, sched, init, n=args.n, strength=s,
            steps=args.steps, seed=11, out_path=None,
            ema_params=state.ema_params, class_id=y0, guidance=1.0)
        rows.append(out01)
        mses[f"mse_strength_{s:g}"] = round(float(
            np.mean((out01 * 2.0 - 1.0 - init) ** 2)), 5)
    result.update(mses)
    result["mse_monotone"] = bool(
        all(a < b for a, b in zip(list(mses.values()), list(mses.values())[1:])))
    # row 0 = the init image (repeated to fill the row, keeping the
    # rows-are-strengths alignment of the grid), rows 1.. = one strength each
    init_row = np.repeat(((init + 1) / 2)[None], args.n, axis=0)
    strip = np.concatenate([init_row] + [r for r in rows], axis=0)
    save_image(make_grid(strip, nrow=args.n), args.out_img2img)
    result["img2img_grid"] = args.out_img2img

    # ---- 2. inpaint class swap: keep the face, re-hue the background -----
    b = S // 4
    keep_face = 1.0 - box_mask(S, (b, b, S - b, S - b))  # 1 = keep center
    srcs, tgts, outs = [], [], []
    for k in range(K):
        src, _ = ds[k]  # item k has label k
        tgt = (k + 1) % K
        out01 = inpaint_infer_sample(
            model, state.params, sched, src, keep_face, n=1,
            steps=args.steps, resamples=args.resamples, seed=7 + k,
            out_path=None, ema_params=state.ema_params,
            class_id=tgt, guidance=args.guidance)
        srcs.append((src + 1) / 2)
        tgts.append(tgt)
        outs.append(out01[0])
    outs01 = np.stack(outs)
    pred = classify_bg(outs01, K)  # top rows = pure background (kept box
    # starts at S//4, below the classifier's S//8 band)
    result["inpaint_swap_acc"] = round(float(
        (pred == np.asarray(tgts)).mean()), 4)
    # exact paste: kept pixels survive (compare the in-memory [0,1] arrays;
    # both sides are (x+1)/2 of the same float32 values)
    m = np.asarray(keep_face)[..., 0] == 1
    kept_max_err = max(
        float(np.abs(outs01[i][m] - srcs[i][m]).max()) for i in range(K))
    result["inpaint_kept_max_abs_err"] = kept_max_err
    grid = np.stack([im for pair in zip(srcs, outs) for im in pair])
    save_image(make_grid(grid, nrow=2), args.out_inpaint)
    result["inpaint_grid"] = args.out_inpaint
    print(json.dumps(result))


if __name__ == "__main__":
    main()
