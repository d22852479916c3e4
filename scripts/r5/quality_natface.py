"""Natural-face quality battery (VERDICT r4 #3): score the quality stack on
the natface checkpoint against its HELD-OUT split.

The r4 quality-vs-NFE table was measured on procedural blobs only; this is
the natural-data rerun: for the split-trained natface64s checkpoint (and
optional PD / CM students distilled FROM it), samples a fixed grid through
every sampler family and records rFID vs the held-out faces (the 10%
val split the training run never saw — reproduced here with the same
seeded permutation as ``cli train --val-frac``), plus samples/s on the
chip.  Also emits one img2img and one inpaint demo on held-out faces.

One process so tunnel drift cancels across rows.

  python scripts/r5/quality_natface.py --ckpt /tmp/r5/ck/natface64s_last \
      --config scripts/r5/natface64s.json --pd-ckpt /tmp/r5/natpd4 \
      --cm-ckpt /tmp/r5/natcm --grid-dir docs/artifacts/r5 \
      --out /tmp/r5/nat_nfe.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def load_split(zip_path: str, img_size: int, seed: int, val_frac: float):
    """Reproduce the cli --val-frac split exactly: materialize the corpus in
    dataset order, permute with default_rng(seed), first n_val rows are
    val.  Returns (train_arr, val_arr) in [-1,1]."""
    from ddpm_diffusion_model_tpu.data import materialize_corpus
    from ddpm_diffusion_model_tpu.data.celeba import get_celeba_loader_from_zip

    zl = get_celeba_loader_from_zip(zip_path, img_size=img_size,
                                    batch_size=128, seed=seed, crop=None)
    arr = materialize_corpus(zl)
    n_val = max(1, min(len(arr) - 1, int(round(len(arr) * val_frac))))
    perm = np.random.default_rng(seed).permutation(len(arr))
    return arr[perm[n_val:]], arr[perm[:n_val]]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="natface64s base checkpoint")
    ap.add_argument("--config", required=True)
    ap.add_argument("--zip-path", default="data/celeba_ref64")
    ap.add_argument("--val-frac", type=float, default=0.1)
    ap.add_argument("--pd-ckpt", help="progressive-distilled student")
    ap.add_argument("--pd-steps", type=int, default=4)
    ap.add_argument("--cm-ckpt", help="consistency student")
    ap.add_argument("--n", type=int, default=36)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-edits", action="store_true")
    ap.add_argument("--grid-dir", default="docs/artifacts/r5")
    ap.add_argument("--out", default="/tmp/r5/nat_nfe.jsonl")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.cli import _exp_from_args, _load_state
    from ddpm_diffusion_model_tpu.sampling.editing import (
        box_mask, img2img_infer_sample, inpaint_infer_sample)
    from ddpm_diffusion_model_tpu.sampling.inference import (
        _ddim_jit, _ddpm_jit, _dpmpp_jit)
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule
    from ddpm_diffusion_model_tpu.training import consistency_sample_loop
    from ddpm_diffusion_model_tpu.utils.fid import rfid
    from ddpm_diffusion_model_tpu.utils.images import save_image_grid

    os.makedirs(args.grid_dir, exist_ok=True)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    outf = open(args.out, "a")

    def emit(row):
        line = json.dumps(row)
        print(line, flush=True)
        outf.write(line + "\n")
        outf.flush()

    exp = _exp_from_args(argparse.Namespace(
        config=args.config, preset="celeba64_low", ckpt=args.ckpt))
    model, sched, state, _ = _load_state(args.ckpt, exp)
    n, S = args.n, exp.img_size
    shape = (n, S, S, 3)

    tr_arr, va_arr = load_split(args.zip_path, S, exp.seed, args.val_frac)
    ref01 = (va_arr + 1.0) / 2.0          # held-out faces, [0,1]
    train01 = (tr_arr[:256] + 1.0) / 2.0  # train-side anchor
    print(f"[split] train {len(tr_arr)} / held-out {len(va_arr)}", flush=True)

    def score_and_time(name, fn, nfe_per_sample, *, grid_name=None,
                       reps=None):
        reps = reps if reps is not None else args.reps
        x = fn(jax.random.key(1))          # compile
        np.asarray(x)
        t0 = time.perf_counter()
        for r in range(reps):
            x = fn(jax.random.key(2 + r))
            jax.block_until_ready(x)
        dt_sync = (time.perf_counter() - t0) / reps
        x_host = np.asarray(x)
        x01 = np.clip((x_host + 1.0) / 2.0, 0.0, 1.0)
        row = {
            "sampler": name,
            "nfe": nfe_per_sample,
            "samples_per_s_sync": round(n / dt_sync, 3),
            "rfid_heldout": round(float(rfid(ref01, x01)), 3),
            "rfid_train": round(float(rfid(train01, x01)), 3),
            "n": n,
        }
        if grid_name:
            path = os.path.join(args.grid_dir, grid_name)
            save_image_grid(x01, path, nrow=6)
            row["grid"] = path
        emit(row)
        return row

    base = state.ema_params
    score_and_time(
        "ddpm1000",
        lambda k: _ddpm_jit(model, base, sched, k, shape, None, None)[0],
        1000, grid_name="nat_ddpm1000.png", reps=1)
    ts50 = tuple(int(t) for t in build_ddim_schedule("t_linear", 50, sched.T))
    score_and_time(
        "ddim50",
        lambda k: _ddim_jit(model, base, sched, k, shape, ts50, 0.0, None)[0],
        50, grid_name="nat_ddim50.png")
    ts20 = tuple(int(t) for t in build_ddim_schedule("t_linear", 20, sched.T))
    score_and_time(
        "dpmpp20",
        lambda k: _dpmpp_jit(model, base, sched, k, shape, ts20),
        20, grid_name="nat_dpmpp20.png")
    score_and_time(
        "sde_dpmpp20",
        lambda k: _dpmpp_jit(model, base, sched, k, shape, ts20, sde=True),
        20, grid_name="nat_sde_dpmpp20.png")

    if args.pd_ckpt:
        pd_exp = _exp_from_args(argparse.Namespace(
            config=args.config, preset="celeba64_low", ckpt=args.pd_ckpt))
        pd_model, pd_sched, pd_state, pd_meta = _load_state(
            args.pd_ckpt, pd_exp)
        steps = int((pd_meta.get("extra") or {}).get("distilled_steps",
                                                     args.pd_steps))
        ts = tuple(int(t) for t in build_ddim_schedule(
            "linear", steps, pd_sched.T))
        score_and_time(
            f"pd{steps}",
            lambda k: _ddim_jit(pd_model, pd_state.ema_params, pd_sched, k,
                                shape, ts, 0.0, None)[0],
            steps, grid_name=f"nat_pd{steps}.png")

    if args.cm_ckpt:
        cm_exp = _exp_from_args(argparse.Namespace(
            config=args.config, preset="celeba64_low", ckpt=args.cm_ckpt))
        cm_model, cm_sched, cm_state, _ = _load_state(args.cm_ckpt, cm_exp)
        for steps in (1, 2):
            cm_jit = jax.jit(
                lambda p, k, s=steps: consistency_sample_loop(
                    cm_model, p, cm_sched, shape, k, steps=s))
            score_and_time(
                f"cm{steps}",
                lambda k, f=cm_jit: f(cm_state.ema_params, k),
                steps, grid_name=f"nat_cm{steps}.png")

    # rFID anchors: held-out-vs-itself (floor) and train-vs-held-out (the
    # distribution gap a perfect model would sit at)
    emit({"sampler": "REF_train_vs_heldout",
          "rfid_heldout": round(float(rfid(ref01, train01)), 3)})

    if not args.skip_edits:
        # --- editing demos on HELD-OUT faces (never trained on) ---
        k = min(6, len(va_arr))
        init = va_arr[:k]
        e1 = img2img_infer_sample(
            model, state.params, sched, init, strength=0.5, steps=50,
            ema_params=state.ema_params,
            out_path=None, seed=7)
        panel = np.concatenate([(init + 1.0) / 2.0, e1], axis=0)
        p1 = os.path.join(args.grid_dir, "nat_img2img.png")
        save_image_grid(np.clip(panel, 0, 1), p1, nrow=k)
        emit({"demo": "img2img", "strength": 0.5, "n": k, "grid": p1})

        mask = box_mask(S, (S // 4, S // 2, 3 * S // 4, S))  # mouth/chin box
        e2 = inpaint_infer_sample(
            model, state.params, sched, init, mask, steps=50, resamples=4,
            ema_params=state.ema_params, out_path=None, seed=7)
        masked01 = ((init * mask[None] + (1 - mask[None])) + 1.0) / 2.0
        panel2 = np.concatenate([(init + 1.0) / 2.0, masked01, e2], axis=0)
        p2 = os.path.join(args.grid_dir, "nat_inpaint.png")
        save_image_grid(np.clip(panel2, 0, 1), p2, nrow=k)
        emit({"demo": "inpaint", "resamples": 4, "n": k, "grid": p2})

    outf.close()


if __name__ == "__main__":
    main()
