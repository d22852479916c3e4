"""Pallas TPU flash attention (blockwise, online softmax, fp32 accumulate).

The TPU-native counterpart of the reference's single fused-kernel call site,
``torch.nn.functional.scaled_dot_product_attention`` (``attention.py:69-70``):
non-causal, no mask, scale = 1/sqrt(d).  The U-Net attends over N = H*W
tokens (64..4096), so the kernel streams K/V in blocks with an online
softmax — O(BLOCK_Q * BLOCK_K) VMEM per program instead of O(N^2) — and the
KV-block loop is the seam where a ring/CP variant can later overlap RDMA
(SURVEY.md §5 long-context plan).

Forward grid: (batch*heads, N // BLOCK_Q), emitting the output AND the
per-row log-sum-exp.  Backward is flash too: a dQ kernel (stream K/V) and a
dK/dV kernel (stream Q/dO) recompute the probabilities from the saved LSE —
O(N) memory end to end, no N x N materialization in either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _pick_block(n: int, target: int = 256) -> int:
    b = min(n, target)
    while n % b:
        b //= 2
    return max(b, 1)


# ---------------------------------------------------------------- forward


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, block_k: int):
    """One (1, BQ, d) output block + its (1, BQ, 1) log-sum-exp."""
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, d)
    bq, d = q.shape
    n = k_ref.shape[1]
    num_kb = n // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _forward_with_lse(q, k, v):
    B, H, N, D = q.shape
    bq = _pick_block(N)
    bk = _pick_block(N)
    scale = 1.0 / (D**0.5)
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)

    kernel = functools.partial(_fwd_kernel, scale=scale, block_k=bk)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, N, 1), jnp.float32),
        ),
        grid=(B * H, N // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=(3 + 1) * B * H * N * D * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, N, D), lse


# ---------------------------------------------------------------- backward


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, scale: float, block_k: int):
    """dQ for one (1, BQ, d) block: stream K/V blocks.

    dS = P * (dP - delta);  dQ = dS K * scale, with P = exp(q k^T*scale - lse)
    and delta = rowsum(dO * O).
    """
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                   # (BQ, 1) fp32
    delta = delta_ref[0]                               # (BQ, 1) fp32
    bq, d = q.shape
    n = k_ref.shape[1]
    num_kb = n // block_k

    def body(i, dq_acc):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)                           # (BQ, BK)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq_acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                *, scale: float, block_q: int):
    """dK/dV for one (1, BK, d) block: stream Q/dO blocks."""
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    n = q_ref.shape[1]
    num_qb = n // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                       # (BQ, BK)
        p = jnp.exp(s - lse)
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)                           # (BQ, BK)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    dk, dv = jax.lax.fori_loop(
        0, num_qb, body,
        (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32)),
    )
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _backward(q, k, v, o, lse, g):
    B, H, N, D = q.shape
    bq = _pick_block(N)
    bk = _pick_block(N)
    scale = 1.0 / (D**0.5)

    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)
    of = o.reshape(B * H, N, D)
    gf = g.reshape(B * H, N, D)
    # delta = rowsum(dO * O) — cheap elementwise+reduce, left to XLA
    delta = jnp.sum(
        gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1, keepdims=True
    )

    full = lambda: pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    fullv = lambda: pl.BlockSpec((1, N, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=bk),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        grid=(B * H, N // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            full(), full(),
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
    )(qf, kf, vf, gf, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=bq),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, N, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, N, D), v.dtype),
        ),
        grid=(B * H, N // bk),
        in_specs=[
            full(),
            pl.BlockSpec((1, bk, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            full(), fullv(), fullv(),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf, gf, lse, delta)

    return (
        dq.reshape(B, H, N, D),
        dk.reshape(B, H, N, D),
        dv.reshape(B, H, N, D),
    )


# ---------------------------------------------------------------- public op


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, h, N, d) non-causal SDPA, bf16/f32 in, input-dtype out."""
    out, _ = _forward_with_lse(q, k, v)
    return out


def _fwd(q, k, v):
    out, lse = _forward_with_lse(q, k, v)
    return out, (q, k, v, out, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    return _backward(q, k, v, o, lse, g)


flash_attention.defvjp(_fwd, _bwd)
