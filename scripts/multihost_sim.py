"""Two-process ``jax.distributed`` simulation on CPU — LOAD-BEARING.

Validates the real multi-host path end to end without pod hardware:

1. coordinator bring-up + global mesh (2 processes x 4 local devices);
2. per-host data sharding (``DataLoader(shard_hosts=True)`` +
   ``host_local_batch_to_global``);
3. a FULL compiled train step per global batch — the gradient all-reduce
   crosses the process boundary (GSPMD collectives over the distributed
   CPU backend, the pod-ICI stand-in);
4. multi-process Orbax checkpoint save + restore (primary-only meta
   sidecar, cross-process barrier) with exact round-trip equality;
5. one SPMD sampling call (``sample_grid_sharded`` with the multi-host
   allgather).

The parent additionally runs the IDENTICAL payload as a single process
over 8 virtual devices and asserts the per-step losses match to float
tolerance — proving the cross-process run computes the same mathematics,
not merely that it doesn't crash.  ``tests/test_multihost_sim.py`` runs
this as an opt-in pytest (slow: 3 fresh interpreters compiling on CPU).

    python scripts/multihost_sim.py
"""

import json
import os
import subprocess
import sys
import time

PORT = 47311
STEPS = 3
RES = 8
GLOBAL_BATCH = 16


def payload(num_processes: int) -> dict:
    """The shared workload; returns marker values for cross-run comparison.

    Runs on ``jax.device_count()`` global devices regardless of how they are
    split into processes — losses must be process-split-invariant."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ddpm_diffusion_model_tpu.data import ArrayDataset, DataLoader
    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.parallel import (
        batch_sharding,
        host_local_batch_to_global,
        make_mesh,
        place_state,
    )
    from ddpm_diffusion_model_tpu.sampling import sample_grid_sharded
    from ddpm_diffusion_model_tpu.training import (
        TrainConfig,
        init_train_state,
        load_checkpoint,
        make_optimizer,
        make_train_step,
        save_checkpoint,
    )

    assert jax.process_count() == num_processes, jax.process_count()
    mesh = make_mesh()

    cfg = UNetConfig(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), time_embed_dim=16, num_heads=1,
                     head_dim=8, img_resolution=RES)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=20, img_size=RES))
    tcfg = TrainConfig(base_lr=1e-3, warmup_steps=2, grad_accum_steps=1,
                       ema_decay=0.99)

    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)),
                        jnp.zeros((1,)))
    tx = make_optimizer(tcfg)
    state, _ = init_train_state(params, tcfg, seed=0, tx=tx)
    state = place_state(state, mesh)
    step_fn = make_train_step(model, sched, tx, tcfg)
    b_shd = batch_sharding(mesh)

    # shared dataset; each process loads only its process_index-strided
    # shard (batch_size is PER HOST), then the global batch is assembled —
    # the multi-host input pipeline contract
    rng = np.random.default_rng(0)
    data = rng.normal(size=(GLOBAL_BATCH * STEPS, RES, RES, 3)).astype(
        np.float32) * 0.3
    per_host = GLOBAL_BATCH // num_processes
    dl = DataLoader(ArrayDataset(data), per_host, shuffle=False,
                    shard_hosts=True, num_workers=1)

    losses = []
    for i, (local_x, _) in enumerate(dl):
        assert local_x.shape[0] == per_host, local_x.shape
        if num_processes == 1:
            # canonicalize to the 2-process global composition (host 0's
            # stride-2 rows, then host 1's) so the control run feeds the
            # step IDENTICAL batches — losses must then match exactly
            local_x = np.concatenate([local_x[0::2], local_x[1::2]])
        gx = host_local_batch_to_global(mesh, local_x)
        assert gx.shape[0] == GLOBAL_BATCH
        state, metrics = step_fn(state, gx)
        losses.append(float(jax.device_get(metrics["loss"])))

    # --- multi-process checkpoint round trip ---
    ckpt_dir = os.environ["SIM_CKPT_DIR"]
    path = save_checkpoint(os.path.join(ckpt_dir, f"sim_p{num_processes}"),
                           state, epoch=0,
                           configs={"train": tcfg.to_dict()})
    template, _ = init_train_state(params, tcfg, seed=0, tx=tx)
    template = place_state(template, mesh)
    restored, meta = load_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        la = np.asarray(a.addressable_data(0))
        lb = np.asarray(b.addressable_data(0))
        np.testing.assert_array_equal(la, lb)
    assert int(restored.step) == STEPS
    assert meta["global_step"] == STEPS

    # --- SPMD sampling across the process boundary ---
    grid = sample_grid_sharded(model, restored.ema_params, sched, mesh,
                               kind="ddim", n=8, img_size=RES, steps=4,
                               seed=7)
    assert grid.shape == (8, RES, RES, 3)
    assert np.isfinite(grid).all()

    return {
        "losses": losses,
        "devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "ckpt": "ok",
        "sample_mean": float(grid.mean()),
    }


def worker(process_id: int, num_processes: int) -> None:
    import jax

    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{PORT}",
            num_processes=num_processes,
            process_id=process_id,
        )
    out = payload(num_processes)
    print(f"RESULT {process_id} " + json.dumps(out), flush=True)


def launch(tmp_dir: str) -> dict:
    """Spawn the 2-process sim AND the 1-process control; parse + compare.

    Returns {"ok": bool, "losses_multi": [...], "losses_single": [...]}."""
    base_env = dict(os.environ)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["SIM_CKPT_DIR"] = tmp_dir
    xla = base_env.get("XLA_FLAGS", "")
    xla = " ".join(f for f in xla.split()
                   if not f.startswith("--xla_force_host_platform_device_count"))

    def run(n_procs, devs_per_proc):
        env = dict(base_env)
        env["XLA_FLAGS"] = (
            f"{xla} --xla_force_host_platform_device_count={devs_per_proc}"
        ).strip()
        # Workers write to FILES, not PIPEs: the processes are coupled by
        # collectives, so draining one worker's pipe while the other fills
        # its 64 KB buffer would deadlock the pair (blocked write -> missed
        # collective -> both stuck until timeout).
        logs = [os.path.join(tmp_dir, f"worker_{n_procs}p_{i}.log")
                for i in range(n_procs)]
        files = [open(p, "w") for p in logs]
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(i), str(n_procs)],
                env=env, stdout=files[i], stderr=subprocess.STDOUT, text=True,
            )
            for i in range(n_procs)
        ]
        deadline = time.monotonic() + 600
        try:
            for p in procs:
                p.wait(timeout=max(1.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            raise
        finally:
            for f in files:
                f.close()
        results = {}
        for i, p in enumerate(procs):
            out = open(logs[i]).read()
            for line in out.splitlines():
                if line.startswith(f"RESULT {i} "):
                    results[i] = json.loads(line.split(" ", 2)[2])
            if p.returncode != 0 or i not in results:
                print(out)
                raise RuntimeError(f"proc {i}/{n_procs} failed "
                                   f"(rc={p.returncode})")
        return results

    multi = run(2, 4)   # 2 processes x 4 devices = 8 global
    single = run(1, 8)  # 1 process  x 8 devices = 8 global (control)

    lm0, lm1 = multi[0]["losses"], multi[1]["losses"]
    ls = single[0]["losses"]
    ok = (
        multi[0]["devices"] == 8 and multi[0]["local_devices"] == 4
        and lm0 == lm1  # both processes observe the identical loss
        and len(ls) == STEPS
        and all(abs(a - b) < 1e-5 for a, b in zip(lm0, ls))
        and multi[0]["ckpt"] == "ok"
        and abs(multi[0]["sample_mean"] - single[0]["sample_mean"]) < 1e-4
    )
    return {"ok": ok, "losses_multi": lm0, "losses_single": ls,
            "multi": multi, "single": single}


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[-2]), int(sys.argv[-1]))
        return
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        res = launch(td)
    print("losses multi :", res["losses_multi"])
    print("losses single:", res["losses_single"])
    print("MULTIHOST SIM:", "OK" if res["ok"] else "FAILED")
    sys.exit(0 if res["ok"] else 1)


if __name__ == "__main__":
    main()
