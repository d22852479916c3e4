"""Device mesh + multi-host initialization.

The reference has NO distributed layer at all (single process, one GPU —
SURVEY.md §2.6).  This module is the TPU-native communication backbone the
new framework adds: a named ``jax.sharding.Mesh`` is the single abstraction;
XLA emits the collectives (grad all-reduce over ICI from sharded jit,
all-gathers for FSDP params) — nothing is hand-called.

Axes:
- ``data``: batch (DP).  Gradient psum falls out of sharded jit.
- ``fsdp``: optional parameter sharding axis (ZeRO-style); params/opt/EMA
  leaves are sharded on their largest divisible dimension.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "batch_sharding",
    "replicated",
    "host_local_batch_to_global",
]


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over all (or given) devices.

    ``shape=None`` puts every device on the first axis.  For 2-D use e.g.
    ``make_mesh((n_data, n_fsdp), ("data", "fsdp"))``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` (coordinator
    address etc. from env or kwargs).  No-op if already initialized or
    single-process — but genuine connect failures (wrong coordinator
    address, firewalled port) PROPAGATE: swallowing them would let every
    host continue as an independent process_count()==1 run, silently
    duplicating the whole workload with identical seeds."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        import os

        msg = str(e).lower()
        # "must be called before any JAX calls": the backend already started
        # (e.g. a library touched jax.devices()).  Benign only for a plain
        # single-process call with no multi-host intent — with kwargs or a
        # cluster env hint the user wanted multi-host and raising is the
        # only honest outcome (late init cannot succeed).
        cluster_hints = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                         "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
                         "MEGASCALE_COORDINATOR_ADDRESS")
        # TPU_WORKER_HOSTNAMES counts only when it names >1 host — TPU
        # plugins set a single-host value on one-chip setups
        multi_tpu = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
        late_but_local = ("must be called before" in msg and not kwargs
                          and not multi_tpu
                          and not any(v in os.environ for v in cluster_hints))
        # coordinator-derivation failures are benign only without any
        # multi-host intent: with kwargs OR a cluster env hint, every host
        # silently continuing as process_count()==1 duplicates the workload
        no_intent = (not kwargs and not multi_tpu
                     and not any(v in os.environ for v in cluster_hints))
        benign = ("already initialized" in msg
                  or "is already" in msg
                  or "single process" in msg
                  or ("coordinator_address" in msg and no_intent)
                  or late_but_local)
        if not benign:
            raise


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``; rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_local_batch_to_global(mesh: Mesh, local_batch: np.ndarray, ndim: int = 4):
    """Assemble a globally-sharded batch from this process's local shard
    (multi-host data loading; ``jax.make_array_from_process_local_data``)."""
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh, ndim), np.asarray(local_batch)
    )
