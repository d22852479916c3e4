"""Sharding rules for train-state pytrees (DP replication / FSDP sharding).

With these placements, plain ``jax.jit`` of the train step over the mesh
compiles to the right SPMD program: gradient all-reduce over ``data``,
parameter all-gather + gradient reduce-scatter over ``fsdp`` — all emitted
by XLA GSPMD over ICI, never hand-written (SURVEY.md §2.6's "TPU-native
equivalent" column).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training.state import TrainState
from .mesh import replicated

__all__ = ["fsdp_leaf_spec", "state_sharding", "place_state", "put_global"]


def fsdp_leaf_spec(leaf: jax.ShapeDtypeStruct, mesh: Mesh, axis: str = "fsdp") -> P:
    """Shard the largest dimension divisible by the axis size; replicate
    when nothing divides (small biases/scales stay replicated)."""
    if axis not in mesh.axis_names:
        return P()
    size = mesh.shape[axis]
    if size <= 1 or not hasattr(leaf, "shape") or leaf.ndim == 0:
        return P()
    dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
    for d in dims:
        if leaf.shape[d] % size == 0 and leaf.shape[d] >= size:
            spec = [None] * leaf.ndim
            spec[d] = axis
            return P(*spec)
    return P()


def state_sharding(state: TrainState, mesh: Mesh, fsdp: bool = False) -> TrainState:
    """A TrainState-shaped tree of NamedShardings."""

    def leaf_sharding(x) -> NamedSharding:
        if not fsdp:
            return replicated(mesh)
        shaped = jax.ShapeDtypeStruct(jnp.shape(x), getattr(x, "dtype", jnp.float32))
        return NamedSharding(mesh, fsdp_leaf_spec(shaped, mesh))

    def tree_shardings(tree):
        return jax.tree.map(leaf_sharding, tree)

    return state.replace(
        step=replicated(mesh),
        params=tree_shardings(state.params),
        opt_state=tree_shardings(state.opt_state),
        ema_params=tree_shardings(state.ema_params),
        ema_decay=replicated(mesh),
        rng=replicated(mesh),
    )


def _put_global(x, s: NamedSharding):
    """Place one leaf onto ``s`` — including meshes spanning OTHER
    processes' devices, where ``jax.device_put`` refuses non-addressable
    targets.  Every process holds the full host value (deterministic init /
    restored checkpoint), so ``make_array_from_callback`` materializes just
    the locally-addressable shards and stitches the global array."""
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    import numpy as np

    if jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
        data = np.asarray(jax.device_get(jax.random.key_data(x)))
        placed = jax.make_array_from_callback(
            data.shape, NamedSharding(s.mesh, P()), lambda idx: data[idx])
        # eager op over a global array: a replicated program all processes run
        return jax.random.wrap_key_data(placed, impl=jax.random.key_impl(x))
    host = np.asarray(jax.device_get(x))
    return jax.make_array_from_callback(host.shape, s, lambda idx: host[idx])


def put_global(tree: Any, mesh: Mesh, spec: P = P()) -> Any:
    """Place a whole pytree onto ``mesh`` with one PartitionSpec (default:
    replicated) — multi-process safe."""
    s = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: _put_global(x, s), tree)


def place_state(state: TrainState, mesh: Mesh, fsdp: bool = False) -> TrainState:
    """Device-put the state with DP-replicated (or FSDP-sharded) placement
    (multi-process safe — see :func:`_put_global`)."""
    shardings = state_sharding(state, mesh, fsdp=fsdp)
    return jax.tree.map(_put_global, state, shardings)
