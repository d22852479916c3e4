"""Fused GroupNorm + SiLU Pallas TPU kernel.

The ResBlock epilogue GN→SiLU (``unet_backbone.py:38,43``) is an HBM-bound
elementwise+reduction chain between MXU convs; fusing it into one VMEM-
resident kernel removes two round trips per block (SURVEY.md §2's "fused
time-bias/GroupNorm/SiLU resblock epilogue" deliverable).

Layout: NHWC, one grid program per batch element; the whole (H, W, C) map
lives in VMEM (fits for every 64px config; big 256px maps fall back to XLA).
Statistics in fp32 like flax/torch; normalize+affine+SiLU emitted in the
input dtype.  Backward = ``jax.vjp`` of the XLA reference implementation
(recompute; same pattern as the flash-attention kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_silu", "gn_silu_reference", "gn_silu_supported"]

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def gn_silu_reference(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, num_groups: int,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """XLA reference: GroupNorm (fp32 stats) then SiLU, NHWC."""
    B, H, W, C = x.shape
    cg = C // num_groups
    xf = x.astype(jnp.float32).reshape(B, H * W, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    norm = (xf - mean) * jax.lax.rsqrt(var + eps)
    norm = norm.reshape(B, H, W, C).astype(x.dtype)
    y = norm * scale.astype(x.dtype) + bias.astype(x.dtype)
    return jax.nn.silu(y)


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float):
    _, H, W, C = x_ref.shape
    N = H * W
    cg = C // num_groups

    x = x_ref[0].reshape(N, C).astype(jnp.float32)
    s = jnp.sum(x, axis=0, keepdims=True)            # (1, C)
    sq = jnp.sum(x * x, axis=0, keepdims=True)       # (1, C)

    # group reduce / broadcast via a 0/1 membership matmul — Mosaic has no
    # lane->sublane reshape, but (1,C)x(C,G) dots ride the MXU
    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0) // cg
    gidx = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    member = (cidx == gidx).astype(jnp.float32)      # (C, G)

    dot = lambda a, b, dims: jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    s_g = dot(s, member, ((1,), (0,)))               # (1, G)
    sq_g = dot(sq, member, ((1,), (0,)))             # (1, G)
    count = float(N * cg)
    mean_g = s_g / count
    var_g = sq_g / count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    mean_c = dot(mean_g, member, ((1,), (1,)))       # (1, C)
    rstd_c = dot(rstd_g, member, ((1,), (1,)))       # (1, C)

    scale = scale_ref[:].astype(jnp.float32).reshape(1, C)
    bias = bias_ref[:].astype(jnp.float32).reshape(1, C)
    y = (x - mean_c) * rstd_c * scale + bias
    y = y * jax.nn.sigmoid(y)  # SiLU
    o_ref[0] = y.reshape(H, W, C).astype(o_ref.dtype)


def gn_silu_supported(x_shape, num_groups: int, dtype) -> bool:
    _, H, W, C = x_shape
    if C % num_groups:
        return False
    # fp32 working copy dominates VMEM
    return H * W * C * 4 * 2 <= _VMEM_BUDGET_BYTES


def _forward(x, scale, bias, num_groups, eps):
    B, H, W, C = x.shape
    kernel = functools.partial(_kernel, num_groups=num_groups, eps=eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * W * C,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=B * H * W * C,
        ),
    )(x, scale.reshape(1, C), bias.reshape(1, C))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gn_silu(x, scale, bias, num_groups: int, eps: float = 1e-6):
    """Fused GroupNorm+SiLU; (B,H,W,C) in, same shape/dtype out."""
    return _forward(x, scale, bias, num_groups, eps)


def _fwd(x, scale, bias, num_groups, eps):
    return _forward(x, scale, bias, num_groups, eps), (x, scale, bias)


def _bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: gn_silu_reference(xx, ss, bb, num_groups, eps),
        x, scale, bias,
    )
    return vjp(g)


gn_silu.defvjp(_fwd, _bwd)
