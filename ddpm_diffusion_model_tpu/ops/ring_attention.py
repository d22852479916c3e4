"""Context-parallel (ring) attention over a mesh axis.

SURVEY.md §2.6/§5 plans sequence parallelism as a later additive change on
top of the blockwise flash kernel; this is that step: Q/K/V are sharded on
the sequence axis across a mesh axis, each device computes attention of its
Q shard against one K/V shard at a time with an online-softmax merge, and
the K/V shards rotate around the ring via ``jax.lax.ppermute`` (XLA lowers
the rotation to ICI ppermutes on TPU; a Pallas RDMA double-buffered variant
is the follow-on optimization — the merge math here is already the one the
kernel would use).

Not needed for fidelity at the reference's N <= 4096 (SURVEY §2.6) — this
exists so attention scales past a single chip's memory when it matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "ring_attention_sharded"]

_NEG_INF = -1e30


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


def ring_attention(q, k, v, axis_name: str):
    """Attention with Q/K/V sharded on the sequence axis over ``axis_name``.

    Call inside ``shard_map``/``pjit`` with (B, h, N_local, d) shards; the
    full sequence is N_local * axis_size.  Non-causal, scale 1/sqrt(d),
    fp32 online-softmax accumulation — numerics match ``flash_attention``.
    """
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
        # rotate the K/V shard one hop around the ring
        perm = [(j, (j + 1) % size) for j in range(size)]
        kk = jax.lax.ppermute(kk, axis_name, perm)
        vv = jax.lax.ppermute(vv, axis_name, perm)
        return kk, vv, m_new, l_new, acc

    B, H, Nl, D = q.shape
    # mark the fresh accumulators as device-varying for shard_map's manual-
    # axes type system (they become varying after the first merge anyway)
    vary = lambda x: jax.lax.pvary(x, axis_name)
    init = (
        k, v,
        vary(jnp.full((B, H, Nl, 1), _NEG_INF, jnp.float32)),
        vary(jnp.zeros((B, H, Nl, 1), jnp.float32)),
        vary(jnp.zeros((B, H, Nl, D), jnp.float32)),
    )
    _kk, _vv, _m, l, acc = jax.lax.fori_loop(0, size, body, init)
    return (acc / l).astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh: Mesh, axis: str = "data"):
    """Convenience wrapper: shard (B, h, N, d) operands on N over ``axis``
    and run :func:`ring_attention` under ``shard_map``."""
    from jax.experimental.shard_map import shard_map

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
