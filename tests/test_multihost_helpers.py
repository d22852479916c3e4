"""Multi-host plumbing on a single process: host-sharded loader slicing,
process-local batch assembly, checkpoint mirroring, profiler trace smoke."""

import os

import jax
import numpy as np

from ddpm_diffusion_model_tpu.data import ArrayDataset, DataLoader
from ddpm_diffusion_model_tpu.parallel import (
    host_local_batch_to_global,
    initialize_distributed,
    make_mesh,
)
from ddpm_diffusion_model_tpu.training import profiler_trace
from ddpm_diffusion_model_tpu.training.checkpoint import mirror_checkpoint


def test_initialize_distributed_noop_single_process():
    initialize_distributed()  # must not raise on single-process
    assert jax.process_count() == 1


def test_initialize_distributed_late_init_policy(monkeypatch):
    """jax raises 'must be called before any JAX calls' when the backend
    already started.  That is benign ONLY for a plain single-process call;
    with explicit kwargs or a cluster env hint the failure must propagate
    (swallowing it would silently duplicate a multi-host workload)."""
    import pytest

    def late(**kw):
        raise RuntimeError(
            "jax.distributed.initialize() must be called before any JAX "
            "calls that might initialise the XLA backend.")

    monkeypatch.setattr(jax.distributed, "initialize", late)
    for var in ("SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES",
                "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)

    initialize_distributed()  # single process, no hints: benign

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    initialize_distributed()  # one-host plugin residue: still benign

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    with pytest.raises(RuntimeError):
        initialize_distributed()  # real multi-host hint: propagate

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("SLURM_JOB_ID", "42")
    with pytest.raises(RuntimeError):
        initialize_distributed()

    monkeypatch.delenv("SLURM_JOB_ID")
    with pytest.raises(RuntimeError):
        initialize_distributed(coordinator_address="10.0.0.1:1234")


def test_shard_hosts_loader_single_process_is_identity():
    arr = np.arange(16, dtype=np.float32).reshape(16, 1, 1, 1)
    ds = ArrayDataset(np.broadcast_to(arr, (16, 2, 2, 3)).copy())
    dl = DataLoader(ds, 4, shuffle=False, shard_hosts=True, num_workers=1)
    vals = np.concatenate([x[..., 0, 0, 0] for x, _ in dl])
    np.testing.assert_array_equal(vals, np.arange(16, dtype=np.float32))


def test_host_local_batch_to_global():
    mesh = make_mesh()
    local = np.random.default_rng(0).random((8, 4, 4, 3)).astype(np.float32)
    arr = host_local_batch_to_global(mesh, local)
    assert arr.shape == (8, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(arr), local, rtol=1e-6)
    assert not arr.sharding.is_fully_replicated


def test_mirror_checkpoint(tmp_path):
    src = tmp_path / "ckpt_e000"
    os.makedirs(src / "sub")
    (src / "data.bin").write_bytes(b"abc")
    (src / "sub" / "x").write_text("y")

    dst = mirror_checkpoint(str(src), str(tmp_path / "mirror"), "latest")
    assert dst and os.path.exists(os.path.join(dst, "data.bin"))

    # replace semantics
    (src / "data.bin").write_bytes(b"abcd")
    dst2 = mirror_checkpoint(str(src), str(tmp_path / "mirror"), "latest")
    with open(os.path.join(dst2, "data.bin"), "rb") as f:
        assert f.read() == b"abcd"

    # failure never raises
    assert mirror_checkpoint(str(src), "", "x") is None


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    with profiler_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    # trace directory produced something
    assert any(os.scandir(tmp_path / "trace"))

    with profiler_trace(None):  # disabled path
        pass
