"""Multi-head self-attention compute path.

The reference leans on ``torch.nn.functional.scaled_dot_product_attention``
(``src/model/attention.py:69-70``) as its single fused-kernel call site.  Our
TPU equivalent is a Pallas flash-attention kernel (blockwise, online softmax,
fp32 accumulate) with an XLA fallback used on CPU / interpret mode and for
shapes too small to benefit from a custom kernel.

Interface: ``multi_head_attention(q, k, v)`` with (B, heads, N, d) operands,
non-causal, returning (B, heads, N, d) in the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["multi_head_attention", "attention_xla"]


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain XLA scaled-dot-product attention, fp32 softmax accumulate.

    Numerics match torch SDPA (scale = 1/sqrt(d), non-causal, no dropout).
    XLA fuses this well for the short sequences the U-Net produces at
    16x16/8x8 feature maps; it is also the CPU-test reference for the Pallas
    kernel.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("impl",))
def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch to the best attention implementation for the backend.

    impl: "auto" | "xla" | "pallas".  "auto" selects the Pallas flash kernel
    on TPU when the sequence is long enough to pay for it, else XLA.
    """
    if impl == "xla":
        return attention_xla(q, k, v)
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v)
    # auto
    on_tpu = jax.default_backend() == "tpu"
    n = q.shape[-2]
    if on_tpu and n >= 256:
        try:
            from .flash_attention import flash_attention
        except ImportError:
            return attention_xla(q, k, v)
        return flash_attention(q, k, v)
    return attention_xla(q, k, v)
