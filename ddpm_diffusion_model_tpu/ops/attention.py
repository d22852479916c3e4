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


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Plain XLA scaled-dot-product attention, fp32 softmax accumulate.

    Numerics match torch SDPA (scale = 1/sqrt(d), non-causal).  Optional
    attention-weight dropout replicates torch SDPA's ``dropout_p`` semantics
    (``src/model/attention.py:67-70``): drop softmax probabilities with rate
    p and rescale survivors by 1/(1-p), training mode only.  XLA fuses this
    well for the short sequences the U-Net produces at 16x16/8x8 feature
    maps; it is also the CPU-test reference for the Pallas kernel.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch to the best attention implementation for the backend.

    impl: "auto" | "xla" | "pallas" | "ring".  "auto" selects the Pallas
    flash kernel on TPU when the sequence is long enough to pay for it, else
    XLA.  "ring" is context-parallel attention over the sequence axis of an
    ambient ``context_parallel_mesh`` (see ``ops.ring_attention``); it stays
    OUTSIDE the jit wrapper below because its trace captures the ambient
    mesh — caching that trace across different meshes would be wrong.
    """
    if impl == "ring":
        from .ring_attention import ring_attention_auto

        return ring_attention_auto(q, k, v)
    return _mha_jit(q, k, v, impl)


@functools.partial(jax.jit, static_argnames=("impl",))
def _mha_jit(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    if impl == "xla":
        return attention_xla(q, k, v)
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v)
    # auto — measured crossover (scripts/profile_attn.py, v5e, r3): at the
    # U-Net's real shapes (B·heads large, N ≤ 256) XLA's single batched
    # einsum beats the flash kernel's B·h·blocks program grid (AttnBlock
    # f+b 16x16: 2.52 ms XLA vs 3.44 ms Pallas at batch 128); the kernel
    # pays off where the N^2 logits materialization starts to dominate
    # (≥2048 tokens ⇒ ≥8 MB/head-pair in bf16) and where its O(block)
    # memory is the point.
    on_tpu = jax.default_backend() == "tpu"
    n = q.shape[-2]
    if on_tpu and n >= 2048:
        try:
            from .flash_attention import flash_attention
        except ImportError:
            return attention_xla(q, k, v)
        return flash_attention(q, k, v)
    return attention_xla(q, k, v)
