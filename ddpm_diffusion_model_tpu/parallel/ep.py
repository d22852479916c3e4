"""Expert parallelism: MoE expert-sharding over an ``expert`` mesh axis.

The reference has no parallelism of any kind (SURVEY.md §2.6) and no MoE;
EP was the one strategy row this framework still documented as out of scope
after round 2 (PP landed with the DiT family).  The MoE-DiT family
(``models/moe.py``) closes it: expert FFN weights and the dispatched token
blocks carry a leading expert axis E, and under an active
:func:`expert_parallel_mesh` context the layer constrains those arrays to be
sharded over the mesh's expert axis.  GSPMD then partitions the expert
matmuls by expert group and inserts the dispatch/return collectives (the
all-to-all pattern of Switch Transformer / GShard) on the dispatch einsums
— nothing is hand-called, matching the framework's mesh-first design.

Numerics are unchanged (equality-tested against the unsharded forward and
gradients on the CPU mesh); only the partitioning moves.  EP composes with
DP: the batch stays on ``data`` while experts split over ``expert``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.ambient import AmbientMeshStack

__all__ = [
    "expert_parallel_mesh",
    "current_ep_mesh",
    "shard_experts",
    "ep_param_specs",
    "place_params_ep",
]

_EP_CONTEXT = AmbientMeshStack("expert parallelism")


def expert_parallel_mesh(mesh: Mesh, axis: str = "expert"):
    """Trace-time declaration of the (mesh, axis) for expert sharding.

    Usage::

        with expert_parallel_mesh(mesh, "expert"):
            y = jax.jit(model.apply)(params, x, t)   # experts sharded
    """
    return _EP_CONTEXT(mesh, axis)


def current_ep_mesh() -> Optional[Tuple[Mesh, str]]:
    return _EP_CONTEXT.current()


def shard_experts(x: jax.Array) -> jax.Array:
    """Constrain an expert-major array (leading dim = num_experts) to be
    sharded over the ambient EP mesh axis (no-op without a context).

    Used on the dispatched token blocks ``(E, groups, capacity, H)`` and the
    expert FFN intermediates — the arrays whose leading axis is the expert
    id.  Requires E divisible by the axis size (whole experts per device).
    """
    ctx = current_ep_mesh()
    if ctx is None:
        return x
    mesh, axis = ctx
    size = mesh.shape[axis]
    if x.shape[0] % size:
        raise ValueError(
            f"num_experts {x.shape[0]} not divisible by mesh axis "
            f"{axis!r} ({size})"
        )
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def ep_param_specs(params, mesh: Mesh, axis: str = "expert"):
    """PartitionSpec tree sharding MoE expert weights (leaves whose path
    goes through a ``moe`` module: ``wi``/``wo``/``bi``/``bo``) over
    ``axis``; everything else replicated.

    The expert dim is located from the trailing rank, not assumed leading:
    ``wi``/``wo`` are (..., E, d_in, d_out) and ``bi``/``bo`` (..., E, d) —
    under ``nn.scan`` a layer axis L prefixes all of them.
    """
    size = mesh.shape[axis]
    trailing = {"wi": 2, "wo": 2, "bi": 1, "bo": 1}

    def spec_for(path, leaf) -> P:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        name = keys[-1] if keys else ""
        if any(k == "moe" for k in keys) and name in trailing:
            e_ax = leaf.ndim - trailing[name] - 1
            if e_ax >= 0 and leaf.shape[e_ax] % size == 0:
                spec = [None] * leaf.ndim
                spec[e_ax] = axis
                return P(*spec)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place_params_ep(params, mesh: Mesh, axis: str = "expert"):
    """Device-put params with :func:`ep_param_specs` placement."""
    specs = ep_param_specs(params, mesh, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
