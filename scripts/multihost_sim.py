"""Two-process ``jax.distributed`` simulation on CPU.

Validates the real multi-host bring-up path (coordinator + per-process
device views + per-host data sharding via
``host_local_batch_to_global``) without TPU pod hardware — the multi-host
analogue of the virtual-8-device single-process tests.

    python scripts/multihost_sim.py            # spawns both processes
    (run with a sanitized env if a TPU plugin is force-registered)
"""

import os
import subprocess
import sys

PORT = 47311


def worker(process_id: int, num_processes: int) -> None:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ddpm_diffusion_model_tpu.data import ArrayDataset, DataLoader
    from ddpm_diffusion_model_tpu.parallel import host_local_batch_to_global, make_mesh

    assert jax.process_count() == num_processes, jax.process_count()
    mesh = make_mesh()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    # per-host strided slice of a shared dataset
    data = np.arange(32, dtype=np.float32).reshape(32, 1, 1, 1)
    ds = ArrayDataset(np.broadcast_to(data, (32, 2, 2, 3)).copy())
    dl = DataLoader(ds, 8, shuffle=False, shard_hosts=True, num_workers=1)
    local_x, _ = next(iter(dl))

    # assemble the global batch from each process's local shard
    global_batch = host_local_batch_to_global(mesh, local_x)
    total = float(jax.jit(lambda x: x.sum())(global_batch))
    print(
        f"[proc {process_id}] global_devices={n_global} local={n_local} "
        f"local_batch={local_x.shape} global={global_batch.shape} sum={total}",
        flush=True,
    )


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[-2]), int(sys.argv[-1]))
        return

    num = 2
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i), str(num)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(num)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        print(out.strip())
        ok &= p.returncode == 0 and f"[proc {i}]" in out
    print("MULTIHOST SIM:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
