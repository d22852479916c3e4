"""Quality-vs-NFE evidence on hardware (round 4, VERDICT item #1).

For the trained 6-class CFG blob checkpoint plus its progressive-distilled
and consistency-distilled students, samples a fixed labeled grid through
every sampler family, and records for each:

  - rFID (utils/fid.py) of the 36 samples vs 256 held-out blob faces
  - class accuracy of the guided samples (background-hue classifier, the
    falsifiable conditioning check from examples/conditional_cfg.py)
  - samples/s on the chip, timed two ways: device-sync
    (jax.block_until_ready) and with the host fetch of the grid timed
    separately (the r4 sync-methodology record — see scripts/r4/sync_check.py)
  - the sample grid itself (rows = classes) under --grid-dir

One process so the tunnel drift cancels across rows.  Emits one JSON line
per sampler row plus a trailing summary line.

Usage:
  python scripts/r4/quality_nfe.py --ckpt /tmp/r4/ck/cfg6_v_last \
      --config scripts/r4/cfg6_v.json --pd-ckpt /tmp/r4/pd4 \
      --cm-ckpt /tmp/r4/cm --grid-dir docs/artifacts/r4 --out /tmp/r4/nfe.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def classify_bg(x01: np.ndarray, num_classes: int) -> np.ndarray:
    """Nearest class-anchor hue of each image's top-row mean color
    (mirrors examples/conditional_cfg.py)."""
    from ddpm_diffusion_model_tpu.data.synthetic import _class_hue_rgb

    anchors = np.stack([_class_hue_rgb(k, num_classes)
                        for k in range(num_classes)])
    top = x01[:, : x01.shape[1] // 8].mean(axis=(1, 2))
    d = np.linalg.norm(top[:, None] - anchors[None], axis=-1)
    return np.argmin(d, axis=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="base CFG checkpoint")
    ap.add_argument("--config", required=True)
    ap.add_argument("--pd-ckpt", help="progressive-distilled student (4-step)")
    ap.add_argument("--pd-steps", type=int, default=4)
    ap.add_argument("--cm-ckpt", help="consistency student")
    ap.add_argument("--n", type=int, default=36)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions for the fast samplers")
    ap.add_argument("--grid-dir", default="docs/artifacts/r4")
    ap.add_argument("--out", default="/tmp/r4/nfe.jsonl")
    ap.add_argument("--skip-base", action="store_true",
                    help="score only the distilled students (re-runs)")
    ap.add_argument("--tag", default="",
                    help="suffix for sampler names/grids in re-runs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.cli import _exp_from_args, _load_state
    from ddpm_diffusion_model_tpu.data import BlobFacesDataset
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
    K = int(getattr(exp.model, "num_classes", 0))
    assert K > 0, "quality_nfe needs a conditional checkpoint"
    n, S = args.n, exp.img_size
    labels = np.arange(n, dtype=np.int32) % K  # rows = classes at nrow=K
    y = jnp.asarray(labels)
    shape = (n, S, S, 3)

    # held-out reference set for rFID (class-balanced like the samples)
    ds = BlobFacesDataset(256, img_size=S, seed=exp.seed + 777, num_classes=K)
    ref01 = np.stack([(np.asarray(ds[i][0]) + 1.0) / 2.0
                      for i in range(len(ds))])

    def score_and_time(name, fn, nfe_per_sample, *, grid_name=None,
                       reps=None):
        """fn(key) -> x in [-1,1]; times reps calls (block_until_ready),
        then the host fetch separately, then scores the fetched grid."""
        reps = reps if reps is not None else args.reps
        x = fn(jax.random.key(1))          # compile
        np.asarray(x)                      # true sync incl. transport drain
        t0 = time.perf_counter()
        for r in range(reps):
            x = fn(jax.random.key(2 + r))
            jax.block_until_ready(x)
        dt_sync = (time.perf_counter() - t0) / reps
        t1 = time.perf_counter()
        x_host = np.asarray(x)
        dt_fetch = time.perf_counter() - t1
        x01 = np.clip((x_host + 1.0) / 2.0, 0.0, 1.0)
        pred = classify_bg(x01, K)
        row = {
            "sampler": name,
            "nfe": nfe_per_sample,
            "samples_per_s_sync": round(n / dt_sync, 3),
            "samples_per_s_with_fetch": round(n / (dt_sync + dt_fetch), 3),
            "fetch_s": round(dt_fetch, 4),
            "rfid": round(float(rfid(ref01, x01)), 3),
            "class_acc": round(float((pred == labels).mean()), 4),
            "n": n,
        }
        if grid_name:
            path = os.path.join(args.grid_dir, grid_name)
            save_image_grid(x01, path, nrow=K)
            row["grid"] = path
        emit(row)
        return row

    w = float(args.guidance)
    base = state.ema_params
    tag = args.tag
    if args.skip_base:
        base = None
    # every guided base-model step runs the doubled CFG forward: NFE = 2*steps
    if base is not None:
        score_and_time(
        f"ddpm1000_w{w:g}",
        lambda k: _ddpm_jit(model, base, sched, k, shape, None, None,
                            y=y, guidance=w)[0],
            2000, grid_name="nfe_ddpm1000.png", reps=1)
        ts50 = tuple(int(t) for t in
                     build_ddim_schedule("t_linear", 50, sched.T))
        score_and_time(
            f"ddim50_w{w:g}",
            lambda k: _ddim_jit(model, base, sched, k, shape, ts50, 0.0,
                                None, y=y, guidance=w)[0],
            100, grid_name="nfe_ddim50.png")
        ts20 = tuple(int(t) for t in
                     build_ddim_schedule("t_linear", 20, sched.T))
        score_and_time(
            f"dpmpp20_w{w:g}",
            lambda k: _dpmpp_jit(model, base, sched, k, shape, ts20,
                                 y=y, guidance=w),
            40, grid_name="nfe_dpmpp20.png")
        score_and_time(
            f"sde_dpmpp20_w{w:g}",
            lambda k: _dpmpp_jit(model, base, sched, k, shape, ts20,
                                 y=y, guidance=w, sde=True),
            40, grid_name="nfe_sde_dpmpp20.png")

    if args.pd_ckpt:
        pd_exp = _exp_from_args(argparse.Namespace(
            config=args.config, preset="celeba64_low", ckpt=args.pd_ckpt))
        pd_model, pd_sched, pd_state, pd_meta = _load_state(args.pd_ckpt, pd_exp)
        steps = int((pd_meta.get("extra") or {}).get("distilled_steps",
                                                     args.pd_steps))
        ts = tuple(int(t) for t in build_ddim_schedule(
            "linear", steps, pd_sched.T))
        # guidance baked in at distillation: single forward per step
        score_and_time(
            f"pd{steps}_baked_w{w:g}{tag}",
            lambda k: _ddim_jit(pd_model, pd_state.ema_params, pd_sched, k,
                                shape, ts, 0.0, None, y=y, guidance=1.0)[0],
            steps, grid_name=f"nfe_pd{steps}{tag}.png")

    if args.cm_ckpt:
        cm_exp = _exp_from_args(argparse.Namespace(
            config=args.config, preset="celeba64_low", ckpt=args.cm_ckpt))
        cm_model, cm_sched, cm_state, _ = _load_state(args.cm_ckpt, cm_exp)
        for steps in (1, 2):
            cm_jit = jax.jit(
                lambda p, k, s=steps: consistency_sample_loop(
                    cm_model, p, cm_sched, shape, k, steps=s, y=y))
            score_and_time(
                f"cm{steps}_baked_w{w:g}{tag}",
                lambda k, f=cm_jit: f(cm_state.ema_params, k),
                steps, grid_name=f"nfe_cm{steps}{tag}.png")

    # reference-set sanity anchors for the rFID column
    emit({"sampler": "REF_heldout_self", "rfid": round(float(
        rfid(ref01[:128], ref01[128:])), 3),
        "note": "held-out vs held-out — the floor"})
    rng = np.random.default_rng(0)
    emit({"sampler": "REF_noise", "rfid": round(float(
        rfid(ref01, rng.uniform(0, 1, (n, S, S, 3)).astype(np.float32))), 3),
        "note": "uniform noise — the ceiling"})
    outf.close()


if __name__ == "__main__":
    main()
