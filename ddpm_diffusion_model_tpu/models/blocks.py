"""U-Net building blocks: GroupNorm, ResBlock, attention, down/upsample.

TPU-native redesign of ``src/model/unet_backbone.py:10-64`` and
``src/model/attention.py:38-74``: NHWC layout throughout (TPU convolutions
are NHWC-native — the reference's ``channels_last`` flag was its NCHW
workaround), bf16 compute / fp32 params, GroupNorm computed in fp32 (what
torch autocast does implicitly for the reference).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention

__all__ = ["group_norm", "ResBlock", "AttnBlock", "Downsample", "Upsample"]


def group_norm(channels: int, num_groups: int = 32, name: Optional[str] = None) -> nn.GroupNorm:
    """GN with num_groups=min(32, channels), eps=1e-6, affine — parity with
    ``attention.py:38-39``.  Runs in fp32 regardless of activation dtype.

    When min(32, C) does not divide C (possible for decoder concat widths
    with nonstandard base channels — a config the reference's torch GN would
    crash on) we fall back to the largest divisor of C that is <= 32, so
    behavior is identical wherever the reference works at all."""
    groups = min(num_groups, channels)
    while channels % groups:
        groups -= 1
    return nn.GroupNorm(
        num_groups=groups,
        epsilon=1e-6,
        use_bias=True,
        use_scale=True,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        name=name,
    )


class ResBlock(nn.Module):
    """Residual block: GN→SiLU→3x3 conv → +time-bias → GN→SiLU→Dropout→3x3 conv,
    skip = identity or 1x1 conv on channel change.

    Parity: ``unet_backbone.py:10-44``.  The time bias is SiLU→Dense(time_dim
    → out_ch), broadcast over (H, W).
    """

    out_ch: int
    dropout: float = 0.0
    deterministic: bool = True  # attribute (not call arg) so nn.remat wraps cleanly
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        conv = lambda name: nn.Conv(
            self.out_ch, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )

        h = group_norm(in_ch, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = conv("conv1")(h)

        t_bias = nn.Dense(
            self.out_ch, dtype=self.dtype, param_dtype=self.param_dtype,
            name="time_proj",
        )(nn.silu(t_emb.astype(jnp.float32)).astype(self.dtype))
        h = h + t_bias[:, None, None, :]

        h = group_norm(self.out_ch, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        h = nn.Conv(
            self.out_ch, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )(h)

        if in_ch != self.out_ch:
            skip = nn.Conv(
                self.out_ch, (1, 1),
                dtype=self.dtype, param_dtype=self.param_dtype, name="skip",
            )(x.astype(self.dtype))
        else:
            skip = x.astype(h.dtype)
        return h + skip


class AttnBlock(nn.Module):
    """Pre-norm residual multi-head self-attention over flattened H·W tokens.

    Parity: ``attention.py:42-74`` — 1x1 (bias-free) qkv projection to
    inner = heads*head_dim (inner may differ from channels), SDPA, 1x1
    output projection, residual add.  The qkv/proj 1x1 convs become Dense
    layers over the channel axis (identical math, MXU-friendly).
    """

    num_heads: int = 4
    head_dim: int = 64
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        N = H * W
        inner = self.num_heads * self.head_dim

        h = group_norm(C, name="norm")(x).astype(self.dtype)
        qkv = nn.Dense(
            inner * 3, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="qkv",
        )(h.reshape(B, N, C))
        qkv = qkv.reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)          # each (B, N, heads, d)
        q = jnp.swapaxes(q, 1, 2)                  # (B, heads, N, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, inner)
        out = nn.Dense(
            C, dtype=self.dtype, param_dtype=self.param_dtype, name="proj",
        )(out)
        return x + out.reshape(B, H, W, C).astype(x.dtype)


class Downsample(nn.Module):
    """Factor-2 downsample via 3x3 stride-2 conv (parity: unet_backbone.py:47-54)."""

    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    """x2 nearest-neighbor upsample + 3x3 conv, anti-checkerboard
    (parity: unet_backbone.py:56-64)."""

    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        # nearest x2 via broadcast-reshape (cheaper than gather-based resize)
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
        x = x.reshape(B, H * 2, W * 2, C)
        return nn.Conv(
            self.channels, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
