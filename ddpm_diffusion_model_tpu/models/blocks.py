"""U-Net building blocks: GroupNorm, ResBlock, attention, down/upsample.

TPU-native redesign of ``src/model/unet_backbone.py:10-64`` and
``src/model/attention.py:38-74``: NHWC layout throughout (TPU convolutions
are NHWC-native — the reference's ``channels_last`` flag was its NCHW
workaround), bf16 compute / fp32 params, GroupNorm statistics always in fp32
(flax float32-reductions; matches torch autocast's fp32 GN numerics while
keeping the normalize/affine output in the compute dtype).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention

__all__ = ["group_norm", "ResBlock", "AttnBlock", "Downsample", "Upsample"]


def _gn_groups(channels: int, num_groups: int = 32) -> int:
    """min(32, C), falling back to the largest divisor of C (single source
    of truth for fused and unfused GN paths — they must agree or checkpoints
    stop being interchangeable)."""
    groups = min(num_groups, channels)
    while channels % groups:
        groups -= 1
    return groups


def group_norm(
    channels: int,
    num_groups: int = 32,
    dtype: jnp.dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.GroupNorm:
    """GN with num_groups=min(32, channels), eps=1e-6, affine — parity with
    ``attention.py:38-39``.

    Mean/variance are ALWAYS fp32 (flax ``force_float32_reductions``); only
    the normalize+affine output runs in ``dtype``.  Passing the block's bf16
    compute dtype is numerically equivalent to the fp32-GN-then-cast the
    reference's autocast does (the cast happens either way) and measured
    ~7% faster end-to-end on v5e.

    When min(32, C) does not divide C (possible for decoder concat widths
    with nonstandard base channels — a config the reference's torch GN would
    crash on) we fall back to the largest divisor of C that is <= 32, so
    behavior is identical wherever the reference works at all."""
    groups = _gn_groups(channels, num_groups)
    return nn.GroupNorm(
        num_groups=groups,
        epsilon=1e-6,
        use_bias=True,
        use_scale=True,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class FusedGNSiLU(nn.Module):
    """GroupNorm+SiLU (+ optional fused time-bias) via the tiled Pallas
    kernels (``ops.fused_norm``).

    Parameter names/shapes match ``nn.GroupNorm`` ("scale"/"bias", (C,)) so a
    model can flip between fused and unfused without touching checkpoints.
    """

    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..ops.fused_norm import gn_silu, gn_silu_bias

        groups = _gn_groups(self.channels)
        scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        if time_bias is not None:
            return gn_silu_bias(
                x.astype(self.dtype), scale, bias,
                time_bias.astype(jnp.float32), groups,
            )
        return gn_silu(x.astype(self.dtype), scale, bias, groups)


def _use_fused_gn(x: jnp.ndarray, channels: int, enabled: bool = False) -> bool:
    """Gate for the tiled Pallas fused GN+SiLU path (``ResBlock(fused_gn=
    True)`` / ``UNetDenoiser(fused_gn=True)``).

    History: round 1's whole-map-in-VMEM kernel measured SLOWER than XLA at
    64px (688 vs 830 imgs/s) and could not run at 256px at all; the round-2
    tiled rewrite targets exactly the 256x256x128 HBM-bound epilogue and
    additionally swallows the time-bias add.  Still opt-in — enable where
    measurement wins (see docs/BENCH.md)."""
    if not enabled:
        return False
    import jax

    from ..ops.fused_norm import gn_silu_supported

    return jax.default_backend() == "tpu" and gn_silu_supported(
        x.shape, _gn_groups(channels), x.dtype
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
    fused_gn: bool = False      # Pallas GN+SiLU kernel (see _use_fused_gn)
    # "packed": uint8-compare masks at 8 random bits/element (ops.dropout —
    # rate quantized to 1/256); "flax": exact-bernoulli nn.Dropout
    dropout_impl: str = "packed"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        conv = lambda name: nn.Conv(
            self.out_ch, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )

        if _use_fused_gn(x, in_ch, self.fused_gn):
            h = FusedGNSiLU(in_ch, dtype=self.dtype, name="norm1")(x)
        else:
            h = group_norm(in_ch, dtype=self.dtype, name="norm1")(x)
            h = nn.silu(h).astype(self.dtype)
        h = conv("conv1")(h)

        t_bias = nn.Dense(
            self.out_ch, dtype=self.dtype, param_dtype=self.param_dtype,
            name="time_proj",
        )(nn.silu(t_emb.astype(jnp.float32)).astype(self.dtype))

        if _use_fused_gn(h, self.out_ch, self.fused_gn):
            # the (B,C) time bias rides into the fused normalize pass — the
            # broadcast h + t_bias materialization disappears entirely
            h = FusedGNSiLU(self.out_ch, dtype=self.dtype, name="norm2")(
                h, time_bias=t_bias)
        else:
            h = h + t_bias[:, None, None, :]
            h = group_norm(self.out_ch, dtype=self.dtype, name="norm2")(h)
            h = nn.silu(h).astype(self.dtype)
        if self.dropout > 0.0:
            if self.dropout_impl == "packed":
                from ..ops.dropout import PackedDropout

                h = PackedDropout(self.dropout,
                                  deterministic=self.deterministic)(h)
            else:
                h = nn.Dropout(self.dropout,
                               deterministic=self.deterministic)(h)
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

    ``p_drop`` is torch SDPA's ``dropout_p`` (``attention.py:43,67-70``):
    dropout on the softmax attention weights, active only when
    ``deterministic=False``; it routes through the XLA attention path (the
    Pallas flash kernel has no dropout — matching how torch SDPA itself
    falls off the flash kernel when dropout is requested).
    """

    num_heads: int = 4
    head_dim: int = 64
    p_drop: float = 0.0
    deterministic: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        N = H * W
        inner = self.num_heads * self.head_dim

        h = group_norm(C, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(
            inner * 3, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="qkv",
        )(h.reshape(B, N, C))
        qkv = qkv.reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)          # each (B, N, heads, d)
        q = jnp.swapaxes(q, 1, 2)                  # (B, heads, N, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        from ..parallel.tp import shard_heads

        q, k, v = shard_heads(q), shard_heads(k), shard_heads(v)
        if self.p_drop > 0.0 and not self.deterministic:
            # attention-weight dropout needs the materialized (N, N) probs,
            # so it runs the dense XLA path.  That silently defeating
            # ring/context-parallel attention (whose point is never holding
            # N^2 logits) would be a correctness trap — refuse instead.
            if self.attn_impl == "ring":
                raise ValueError(
                    "attn_impl='ring' does not support attention-weight "
                    "dropout (attn_p_drop > 0 in train mode): the dense "
                    "dropout path materializes the N^2 logits that ring/CP "
                    "attention exists to avoid. Set attn_p_drop=0.0 or use "
                    "a dense attn_impl.")
            from ..ops.attention import attention_xla

            out = attention_xla(
                q, k, v,
                dropout_rate=self.p_drop,
                dropout_rng=self.make_rng("dropout"),
            )
        else:
            out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = shard_heads(out)
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
