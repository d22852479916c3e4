"""MoE payoff experiment (VERDICT r3 #7): MoE-DiT-S/4 vs dense DiT-S/4 on
blobs, matched steps AND matched wall-clock, scored by held-out eval loss
and rFID.

Runs the train step directly (the bench.py path — the CLI's epoch loop was
measured 17x slower for the MoE on this tunnel, see docs/BENCH.md r4 note)
over an HBM-resident blob corpus with an on-device gather per step, so the
comparison measures the MODELS, not loader glue.  All four runs in one
process so tunnel drift cancels.

  python scripts/r4/moe_payoff.py --steps 3000 --extra-dense-steps 4800
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000,
                    help="matched-steps budget (= matched active FLOPs: the "
                         "switch MoE has the same per-token compute as the "
                         "dense model)")
    ap.add_argument("--extra-dense-steps", type=int, default=0,
                    help="additionally score dense at this step count (set "
                         "to steps * moe_step_time/dense_step_time for the "
                         "wall-clock-matched point)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--corpus", type=int, default=6400)
    ap.add_argument("--eval-n", type=int, default=512)
    ap.add_argument("--rfid-n", type=int, default=36)
    ap.add_argument("--out", default="/tmp/r4/moe_payoff.jsonl")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.data.synthetic import blob_faces_array
    from ddpm_diffusion_model_tpu.models import (
        build_denoiser, dit_moe_64_config, dit_s4_64_config)
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.sampling import ddpm_sample
    from ddpm_diffusion_model_tpu.training import (
        TrainConfig, init_train_state, make_eval_step, make_optimizer,
        make_train_step)
    from ddpm_diffusion_model_tpu.utils.fid import rfid

    sched = make_schedule(DiffusionConfig(
        T=1000, schedule="linear", img_size=64, dynamic_threshold=0.95))
    tcfg = TrainConfig(base_lr=2e-4, warmup_steps=300, grad_accum_steps=1,
                       ema_decay=0.999)

    print(f"[corpus] rendering {args.corpus} blobs ...", flush=True)
    corpus_np = blob_faces_array(args.corpus, 64, seed=0)
    corpus = jnp.asarray(corpus_np, jnp.float32)  # 629 MB HBM, fp32
    heldout = blob_faces_array(args.eval_n, 64, seed=777)
    ref01 = (heldout[: 256] + 1.0) / 2.0
    del corpus_np

    outf = open(args.out, "a")

    def emit(row):
        line = json.dumps(row)
        print(line, flush=True)
        outf.write(line + "\n")
        outf.flush()

    B, N = args.batch, args.corpus

    def run(name, mcfg, steps):
        model = build_denoiser(mcfg, dtype=jnp.bfloat16, remat=True)
        params = model.init(jax.random.key(0), jnp.ones((1, 64, 64, 3)),
                            jnp.zeros((1,)))
        tx = make_optimizer(tcfg)
        state, _ = init_train_state(params, tcfg, tx=tx)
        step_fn = make_train_step(model, sched, tx, tcfg)

        @jax.jit
        def gather(corp, key):
            # corpus rides as an ARGUMENT — closing over it would bake
            # 629 MB of constants into the HLO (the remote compiler
            # rejects the body with HTTP 413)
            idx = jax.random.randint(key, (B,), 0, N)
            return jnp.take(corp, idx, axis=0)

        # compile both programs before the timed region
        state, m = step_fn(state, gather(corpus, jax.random.key(1)))
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        losses = []
        for s in range(steps):
            state, m = step_fn(state, gather(corpus, jax.random.key(1000 + s)))
            if (s + 1) % max(1, steps // 8) == 0:
                losses.append((s + 1, float(jax.device_get(m["loss"]))))
                print(f"[{name}] step {s+1}/{steps} "
                      f"loss {losses[-1][1]:.4f}", flush=True)
        final_loss = float(jax.device_get(m["loss"]))
        dt = time.perf_counter() - t0
        ips = steps * B / dt

        # held-out eval loss (fixed t/noise draws) on raw + EMA params
        eval_fn = make_eval_step(model, sched)
        hx = jnp.asarray(heldout)
        ek = jax.random.key(99)
        v_raw = float(jax.device_get(eval_fn(state.params, hx, ek)))
        v_ema = float(jax.device_get(eval_fn(state.ema_params, hx, ek)))

        samples = ddpm_sample(model, state.ema_params, sched, args.rfid_n,
                              64, seed=4321, return_grid=False)
        r = float(rfid(ref01, samples))
        emit({"run": name, "steps": steps, "imgs_per_s": round(ips, 1),
              "train_loss_final": round(final_loss, 5),
              "val_loss": round(v_raw, 5), "val_loss_ema": round(v_ema, 5),
              "rfid_ema": round(r, 3),
              "params_m": round(sum(x.size for x in
                                    jax.tree.leaves(state.params)) / 1e6, 1)})
        return ips

    dense_cfg, moe_cfg = dit_s4_64_config(), dit_moe_64_config()
    moe_ips = run("moe_matched_steps", moe_cfg, args.steps)
    dense_ips = run("dense_matched_steps", dense_cfg, args.steps)
    extra = args.extra_dense_steps
    if extra == 0:
        # wall-clock-matched: dense gets the steps the MoE's wall time buys
        extra = int(round(args.steps * dense_ips / max(moe_ips, 1e-9)))
    if extra > args.steps:
        run("dense_matched_wallclock", dense_cfg, extra)
    outf.close()


if __name__ == "__main__":
    main()
