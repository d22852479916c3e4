"""Context-parallel (ring) attention over a mesh axis — forward + backward.

SURVEY.md §2.6/§5 plans sequence parallelism as an additive change on top of
the blockwise flash math; this is that component: Q/K/V are sharded on the
sequence axis across a mesh axis, each device computes attention of its Q
shard against one K/V shard at a time with an online-softmax merge, and the
K/V shards rotate around the ring via ``jax.lax.ppermute`` (XLA lowers the
rotation to ICI ppermutes on TPU).

The backward is a custom VJP: probabilities are recomputed from the
forward's saved log-sum-exp (O(N_local) memory, flash-attention style), dQ
accumulates locally, and the dK/dV partial sums TRAVEL WITH their K/V shard
around the same ring — after a full cycle every shard arrives home carrying
the contributions of every Q shard.  No all-reduce is needed.

Not needed for fidelity at the reference's N <= 4096 (the kernel seam is
``src/model/attention.py:69-70``) — this exists so attention scales past a
single chip's memory when it matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "ring_attention_sharded", "context_parallel_mesh"]

_NEG_INF = -1e30


def _rotate(x, axis_name, size):
    """One hop around the ring: shard j moves to device j+1 (mod size)."""
    perm = [(j, (j + 1) % size) for j in range(size)]
    return jax.lax.ppermute(x, axis_name, perm)


def _block_attn(q, k, v, scale):
    """Un-normalized blockwise attention stats: (acc, rowmax, rowsum)."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bhnm,bhmd->bhnd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return acc, m, l


def _ring_forward(q, k, v, axis_name):
    """Online-softmax ring pass.  Returns (o, lse) with lse = m + log(l)."""
    size = jax.lax.psum(1, axis_name)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    qf = q.astype(jnp.float32)

    def body(i, carry):
        kk, vv, m_prev, l_prev, acc = carry
        a, m_cur, l_cur = _block_attn(qf, kk.astype(jnp.float32), vv, scale)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha_p = jnp.exp(m_prev - m_new)
        alpha_c = jnp.exp(m_cur - m_new)
        l_new = l_prev * alpha_p + l_cur * alpha_c
        acc = acc * alpha_p + a * alpha_c
        kk = _rotate(kk, axis_name, size)
        vv = _rotate(vv, axis_name, size)
        return kk, vv, m_new, l_new, acc

    # Derive fresh accumulators FROM the inputs (x*0 keeps shard_map's
    # varying-axes type: under a multi-axis mesh the carry must be varying
    # over exactly the axes q/k/v are — pcast to one fixed axis would break
    # when CP composes with DP)
    zrow = jnp.sum(qf * 0.0, axis=-1, keepdims=True)  # (B, H, Nl, 1) zeros
    init = (k, v, zrow + _NEG_INF, zrow, qf * 0.0)
    _kk, _vv, m, l, acc = jax.lax.fori_loop(0, size, body, init)
    o = (acc / l).astype(q.dtype)
    lse = m + jnp.log(l)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ring_attention(q, k, v, axis_name: str):
    """Attention with Q/K/V sharded on the sequence axis over ``axis_name``.

    Call inside ``shard_map``/``pjit`` with (B, h, N_local, d) shards; the
    full sequence is N_local * axis_size.  Non-causal, scale 1/sqrt(d),
    fp32 online-softmax accumulation — numerics match ``flash_attention``.
    Differentiable: the custom VJP runs a second ring carrying dK/dV partial
    sums home with their shards.
    """
    o, _ = _ring_forward(q, k, v, axis_name)
    return o


def _ring_fwd(q, k, v, axis_name):
    o, lse = _ring_forward(q, k, v, axis_name)
    return o, (q, k, v, o, lse)


def _ring_bwd(axis_name, res, do):
    q, k, v, o, lse = res
    size = jax.lax.psum(1, axis_name)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    qf = q.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    # delta_i = rowsum(dO_i * O_i): the softmax-normalization term of dS
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1, keepdims=True)

    def body(i, carry):
        kk, vv, dkk, dvv, dq = carry
        kf = kk.astype(jnp.float32)
        s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf,
                       preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)  # normalized probs, recomputed from saved lse
        dvv = dvv + jnp.einsum("bhnm,bhnd->bhmd", p, dof,
                               preferred_element_type=jnp.float32)
        dp = jnp.einsum("bhnd,bhmd->bhnm", dof, vv.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq = dq + jnp.einsum("bhnm,bhmd->bhnd", ds, kf,
                             preferred_element_type=jnp.float32) * scale
        dkk = dkk + jnp.einsum("bhnm,bhnd->bhmd", ds, qf,
                               preferred_element_type=jnp.float32) * scale
        # rotate the K/V shard AND its traveling gradient one hop: after
        # `size` hops both are back on their home device with every Q
        # shard's contribution accumulated
        kk = _rotate(kk, axis_name, size)
        vv = _rotate(vv, axis_name, size)
        dkk = _rotate(dkk, axis_name, size)
        dvv = _rotate(dvv, axis_name, size)
        return kk, vv, dkk, dvv, dq

    # accumulators derived from inputs — see the forward's varying-axes note
    init = (
        k, v,
        k.astype(jnp.float32) * 0.0,
        v.astype(jnp.float32) * 0.0,
        qf * 0.0,
    )
    _kk, _vv, dk, dv, dq = jax.lax.fori_loop(0, size, body, init)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention.defvjp(_ring_fwd, _ring_bwd)


def ring_attention_sharded(q, k, v, mesh: Mesh, axis: str = "data"):
    """Convenience wrapper: shard (B, h, N, d) operands on N over ``axis``
    and run :func:`ring_attention` under ``shard_map``."""
    from jax import shard_map  # jax>=0.8 home (was jax.experimental)

    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    return fn(q, k, v)


# ---------------------------------------------------------------------------
# trace-time context so model code (AttnBlock) can reach the mesh axis
# ---------------------------------------------------------------------------

from ..utils.ambient import AmbientMeshStack

_CP_CONTEXT = AmbientMeshStack("context parallelism (ring attention)")


def context_parallel_mesh(mesh: Mesh, axis: str):
    """Context manager declaring the (mesh, axis) ring attention should use.

    Model code runs under ``pjit``; ``AttnBlock(attn_impl="ring")`` needs a
    concrete mesh + axis name at TRACE time to open its ``shard_map`` region.
    Usage::

        with context_parallel_mesh(mesh, "cp"):
            loss, grads = train_step(state, batch)   # traces ring attention
    """
    return _CP_CONTEXT(mesh, axis)


def current_cp_mesh():
    """(mesh, axis) of the innermost :func:`context_parallel_mesh`, or None."""
    return _CP_CONTEXT.current()


def ring_attention_auto(q, k, v):
    """Ring attention over the ambient :class:`context_parallel_mesh`.

    Opens a ``shard_map`` over the declared mesh with Q/K/V sharded on the
    sequence (N) axis; composes with an outer jit.  Raises if no context is
    active (the "ring" impl is meaningless without a mesh axis).
    """
    from jax import shard_map  # jax>=0.8 home (was jax.experimental)

    ctx = current_cp_mesh()
    if ctx is None:
        raise RuntimeError(
            'attn_impl="ring" requires an active context_parallel_mesh(mesh, axis)'
        )
    mesh, axis = ctx
    n = q.shape[-2]
    size = mesh.shape[axis]
    if n % size:
        raise ValueError(
            f"sequence length {n} not divisible by mesh axis {axis!r} ({size})"
        )
    # ride an existing DP axis on the batch dim so CP composes with DP
    batch_axis = None
    if (
        "data" in mesh.axis_names
        and axis != "data"
        and q.shape[0] % mesh.shape["data"] == 0
    ):
        batch_axis = "data"  # ride DP; skip for indivisible batches (init trace)
    spec = P(batch_axis, None, axis, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
