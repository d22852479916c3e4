"""Pallas TPU flash attention (blockwise, online softmax, fp32 accumulate).

The TPU-native counterpart of the reference's single fused-kernel call site,
``torch.nn.functional.scaled_dot_product_attention`` (``attention.py:69-70``):
non-causal, no mask, scale = 1/sqrt(d).  The U-Net attends over N = H*W
tokens (64..4096), so the kernel streams K/V in blocks with an online
softmax — O(BLOCK_Q * BLOCK_K) VMEM per program instead of O(N^2) — and the
KV-block loop is the seam where a ring/CP variant can later overlap RDMA
(SURVEY.md §5 long-context plan).

Grid: (batch*heads, N // BLOCK_Q).  Backward pass: the op carries a
``jax.custom_vjp`` whose bwd recomputes attention with the standard closed
form in XLA (cheap at these N; a Pallas bwd kernel is a later optimization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    """One (1, BLOCK_Q, d) output block; stream K/V in block_k chunks."""
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, d)
    bq = q.shape[0]
    d = q.shape[1]
    n = k_ref.shape[1]
    num_kb = n // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # (BK, d)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        m_cur = jnp.max(s, axis=1, keepdims=True)                  # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                                     # (BQ, BK)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_block(n: int, target: int = 256) -> int:
    b = min(n, target)
    while n % b:
        b //= 2
    return max(b, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, h, N, d) non-causal SDPA, bf16/f32 in, input-dtype out."""
    return _flash_attention_fwd_impl(q, k, v)


def _flash_attention_fwd_impl(q, k, v):
    B, H, N, D = q.shape
    bq = _pick_block(N)
    bk = _pick_block(N)
    scale = 1.0 / (D**0.5)

    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)

    kernel = functools.partial(_fa_kernel, scale=scale, block_k=bk)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        grid=(B * H, N // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=(3 + 1) * B * H * N * D * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, N, D)


def _fwd(q, k, v):
    return _flash_attention_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    """Closed-form SDPA backward, recomputed in fp32 XLA (small N)."""
    q, k, v = res
    D = q.shape[-1]
    scale = 1.0 / (D**0.5)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, kf) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd, _bwd)
