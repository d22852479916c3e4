"""Packed dropout: 8 random bits per element instead of bernoulli's 32.

Why this exists (docs/BENCH.md "64px attribution"): the 64px attention
U-Net applies ``dropout=0.1`` on 22 ResBlocks — ~560M bernoulli draws per
forward at batch 128.  ``jax.random.bernoulli`` draws a full 32-bit word
per element and compares in float; even on the TPU hardware RngBitGenerator
(``dropout_rng_impl="rbg"``) the bit generation + mask traffic left ~6 ms
of a 119.5 ms step on the table.

This op draws uint8 random bits directly (``jax.random.bits(key, shape,
uint8)``), compares in uint8, and applies the keep/scale in the compute
dtype:

    bits  : uint8 in [0, 256)
    drop  <=> bits < round(rate * 256)
    y      = x * scale * keep,  scale = 1 / (1 - t/256)

Measured (scripts/profile_dropout.py, v5e, the step's full 560M-draw
workload, in-graph amortized): direct uint8 bits = 0.90 ms vs 5.69 ms for
``bernoulli`` on the same rbg key (the float-uniform convert + fp compare
dominate, not bit generation) and 11.7 ms for threefry bernoulli.  An
earlier revision packed 4 uint8 lanes per uint32 word via
``bitcast_convert_type`` + reshape; in isolation it measured the same
0.92 ms, but the trailing ``(..., n/4, 4)`` relayout is a fusion boundary
inside the ResBlock chain and regressed the full train step by ~8 ms —
the direct draw keeps the mask producer elementwise so XLA fuses it into
the surrounding GN/SiLU/conv chain.

The cheap-bits property is specific to the rbg key family (the train
step's default, ``TrainConfig.dropout_rng_impl="rbg"``): under threefry,
uint8 draws cost a full word of VPU arithmetic per element (measured
13.6 ms for the same workload — on par with threefry bernoulli), so this
op only pays off on the hardware-generator stream.

The drop probability is therefore quantized to 1/256 granularity (rate 0.1
becomes 26/256 ~= 0.1016); the inverted scale uses the ACTUAL t/256 rate,
so E[y] == x exactly.  Dropout rate is a loosely-chosen regularization
hyperparameter — a 1.6% relative shift is far below run-to-run noise — but
the exact-bernoulli path (`flax` impl / ``nn.Dropout``) remains available
via ``UNetDenoiser(dropout_impl="flax")`` for strict reproduction.

Reference parity: the torch model's ``nn.Dropout(dropout)`` inside its
ResBlock (``/root/reference/src/model/unet_backbone.py:10-44``); identical
placement, TPU-shaped mask generation.

No custom VJP: ``d/dx (x * m) = m`` with the mask a constant, and XLA —
seeing the whole train step as one program — freely chooses between storing
the 1-byte mask and regenerating the (cheap) uint8 bits for the backward;
both are ~4x cheaper than the 32-bit path either way.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["packed_dropout", "PackedDropout"]


def _uint8_bits(key: jax.Array, shape) -> jnp.ndarray:
    """uint8 random bits of ``shape``.

    A direct elementwise draw: under the rbg impl the hardware
    RngBitGenerator makes this as cheap as word-packed generation (measured
    equal at 0.9 ms for the 560M-draw step workload) and, unlike the packed
    bitcast+reshape formulation, it fuses into the consuming elementwise
    chain instead of forcing a relayout (see module docstring).
    """
    return jax.random.bits(key, shape, jnp.uint8)


def packed_dropout(x: jnp.ndarray, rate: float, key: jax.Array) -> jnp.ndarray:
    """Dropout with probability ``round(rate*256)/256``, inverted scaling.

    Identity (no bits drawn) when the quantized rate is 0.  ``rate`` must be
    in [0, 1); the quantized rate saturates at 255/256.
    """
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"dropout rate must be in [0, 1), got {rate}")
    t = min(int(round(rate * 256.0)), 255)
    if t == 0:
        return x
    keep_prob = 1.0 - t / 256.0
    # named for the targeted remat policy (UNetDenoiser(remat="masks")):
    # `save_anything_except_these_names("dropout_bits")` makes the backward
    # REGENERATE the bits from the replayed rng (0.9 ms for the whole step)
    # instead of round-tripping ~0.6 GB of saved masks through HBM.  A
    # no-op identity without an enclosing name-aware jax.checkpoint.
    from jax.ad_checkpoint import checkpoint_name

    bits = checkpoint_name(_uint8_bits(key, x.shape), "dropout_bits")
    keep = bits >= jnp.uint8(t)  # P(drop) = t/256 exactly
    scale = jnp.asarray(1.0 / keep_prob, x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


class PackedDropout(nn.Module):
    """Module wrapper with the ``nn.Dropout`` call contract (same rng
    collection name, same ``deterministic`` gate) so blocks can switch
    implementations without touching params or rng plumbing."""

    rate: float
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.deterministic or self.rate == 0.0:
            return x
        return packed_dropout(x, self.rate, self.make_rng("dropout"))
