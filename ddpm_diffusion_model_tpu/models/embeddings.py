"""Time-conditioning embeddings for the U-Net denoiser.

TPU-native counterparts of the reference's ``SinusoidalPosEmb`` and
``TimeMLP`` (``src/model/attention.py:7-35``): pure functions + a small linen
module.  Embedding math runs in float32 (sin/cos of large phases loses too
much in bf16); the projection MLP follows the model's compute dtype.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["sinusoidal_time_embedding", "TimeMLP"]


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Transformer-style sin/cos embedding of (possibly float) timesteps.

    Parity: ``attention.py:13-22`` — freqs = exp(-log(10000) * i/(half-1)),
    emb = [sin(t*f), cos(t*f)], zero-pad one column when ``dim`` is odd.
    Always computes in float32.
    """
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimeMLP(nn.Module):
    """Dense -> SiLU -> Dense projection of the sinusoidal embedding.

    Parity: ``attention.py:25-35``.
    """

    out_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="fc2")(h)
