"""DiT: a transformer denoiser family (beyond-reference, TPU-first).

The reference ships exactly one denoiser — the convolutional U-Net
(``unet_backbone.py:68-218``).  This module adds a second family with the
SAME call contract (``eps = model(x_nhwc, t, deterministic=...)``), so every
other subsystem — diffusion ops, train step, samplers, serving, SPMD
sampling — works unchanged: a Diffusion Transformer (Peebles & Xie 2023,
arXiv:2212.09748) with adaLN-Zero conditioning.

Why a transformer family in a TPU framework:

- the whole network is batched matmuls (patchify, qkv/proj, MLP) — the MXU's
  native diet, with none of the small-spatial-conv relayouts the U-Net's
  decoder pays at 8x8;
- sequence length is static (``(img/patch)^2``) and the attention runs
  through the same ``ops.attention`` dispatcher as the U-Net (XLA SDPA at
  short N, the streamed Pallas flash kernel at long N, ring attention under
  a context-parallel mesh), so the kernel work is shared;
- the L identical blocks compile as ONE ``nn.scan`` iteration (stacked
  params), keeping compile time flat in depth — the canonical XLA pattern
  for deep transformers.

bf16 compute / fp32 params like the U-Net; LayerNorm statistics and the
adaLN modulation MLPs run in fp32 (norm-scale precision dominates diffusion
sample quality at bf16).  adaLN-Zero: every block's modulation head and the
final projection are zero-initialized, so the model starts as the identity
map with eps-hat = 0 — the published recipe for stable large-depth training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention
from .embeddings import sinusoidal_time_embedding

__all__ = ["DiTConfig", "DiTDenoiser", "dit_s4_64_config",
           "dit_b4_64_config", "dit_s4_256_config", "dit_moe_64_config"]


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Architecture knobs (named after the DiT paper's S/B scale points)."""

    in_channels: int = 3
    img_resolution: int = 64
    patch_size: int = 4
    hidden_size: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    time_embed_dim: int = 256
    # MoE (0 = dense MLP): every block's MLP becomes a switch-routed
    # mixture of num_experts expert MLPs (models/moe.py) — the expert-
    # parallelism seam (parallel/ep.py)
    num_experts: int = 0
    capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01
    # class-conditional generation (0 = unconditional): labels embed to
    # hidden_size and add to the adaLN conditioning vector c; index
    # num_classes is the learned NULL token for classifier-free guidance
    num_classes: int = 0

    @property
    def seq_len(self) -> int:
        return (self.img_resolution // self.patch_size) ** 2

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["family"] = "dit"  # ExperimentConfig dispatch discriminator
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "DiTConfig":
        d = dict(d)
        fam = d.pop("family", "dit")
        if fam != "dit":
            raise ValueError(f"not a DiT config (family={fam!r})")
        return cls(**d)


def _posemb_2d_sincos(h: int, w: int, dim: int) -> np.ndarray:
    """Fixed 2D sin/cos position table (dim/2 per axis), fp32 ``(h*w, dim)``.
    Computed host-side from static shapes — a compile-time constant."""
    if dim % 4:
        raise ValueError(f"hidden_size must be divisible by 4, got {dim}")
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))

    def axis(n):
        out = np.einsum("n,d->nd", np.arange(n, dtype=np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (n, dim/2)

    ey, ex = axis(h), axis(w)
    grid = np.concatenate(
        [np.repeat(ey, w, axis=0), np.tile(ex, (h, 1))], axis=1)
    return grid.astype(np.float32)  # (h*w, dim)


class DiTBlock(nn.Module):
    """One transformer block with adaLN-Zero modulation.

    ``__call__(tokens, c) -> (tokens, aux)`` — the scan-body signature;
    ``aux`` is ``None`` for the dense MLP and the scalar fp32 load-balance
    loss when the MLP is a mixture of experts (``num_experts > 0``), so
    ``nn.scan`` stacks per-layer aux losses into its ys-output for free.
    ``c`` is the fp32 conditioning vector (time embedding through the MLP).
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float
    dropout: float
    deterministic: bool
    attn_impl: str
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    num_experts: int = 0
    capacity_factor: float = 1.25
    attn_remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray):
        B, N, H = x.shape
        nh = self.num_heads
        dh = H // nh
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        zero = dict(kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros)

        # adaLN-Zero head: fp32 like the U-Net's time-bias path
        mods = nn.Dense(6 * H, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="ada", **zero)(
            nn.silu(c))
        sh1, sc1, g1, sh2, sc2, g2 = [
            m[:, None, :] for m in jnp.split(mods, 6, axis=-1)]

        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                          dtype=jnp.float32)
        h = (ln(x) * (1.0 + sc1) + sh1).astype(self.dtype)
        qkv = nn.Dense(3 * H, name="qkv", **kw)(h)
        q, k, v = [
            a.reshape(B, N, nh, dh).transpose(0, 2, 1, 3)
            for a in jnp.split(qkv, 3, axis=-1)
        ]
        # TP: head-shard over an ambient tensor_parallel_mesh (no-op
        # otherwise) — the same seam AttnBlock uses (parallel/tp.py)
        from ..parallel.tp import shard_heads

        q, k, v = shard_heads(q), shard_heads(k), shard_heads(v)
        mha = lambda q_, k_, v_: multi_head_attention(  # noqa: E731
            q_, k_, v_, impl=self.attn_impl)
        if self.attn_remat:
            # recompute ONLY the attention in the backward: q/k/v are saved
            # (cheap, B*h*N*d), the fp32 softmax probs — the no-remat OOM
            # cause — are not; the MLP/dense chain keeps XLA's default AD
            mha = jax.checkpoint(mha)
        att = shard_heads(mha(q, k, v))
        att = att.transpose(0, 2, 1, 3).reshape(B, N, H)
        att = nn.Dense(H, name="proj", **kw)(att)
        if self.dropout > 0.0:
            att = nn.Dropout(self.dropout, deterministic=self.deterministic)(att)
        x = x + (g1 * att.astype(jnp.float32)).astype(x.dtype)

        h = (ln(x) * (1.0 + sc2) + sh2).astype(self.dtype)
        if self.num_experts:
            from .moe import MoEMlp

            h, aux = MoEMlp(
                hidden_size=H, mlp_dim=int(H * self.mlp_ratio),
                num_experts=self.num_experts,
                capacity_factor=self.capacity_factor,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="moe")(h)
        else:
            aux = None
            h = nn.Dense(int(H * self.mlp_ratio), name="fc1", **kw)(h)
            h = nn.gelu(h, approximate=True)
            h = nn.Dense(H, name="fc2", **kw)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        x = x + (g2 * h.astype(jnp.float32)).astype(x.dtype)
        return x, aux


class DiTDenoiser(nn.Module):
    """epsilon-hat = DiT(x_t, t); same contract as ``UNetDenoiser``:
    x NHWC in [-1, 1], t (B,) int/float, returns NHWC fp32-in-input-dtype.

    ``scan_blocks=True`` stacks the ``depth`` blocks into one ``nn.scan``
    (params get a leading layer axis): one compiled block body regardless of
    depth.  ``False`` unrolls with per-block names (debug/inspection).
    """

    config: DiTConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # False | True | "dots" | "attn":
    #   True  = full block remat (recompute EVERYTHING in the backward —
    #           including the 6 dense matmuls, ~+33% block FLOPs)
    #   "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
    #           dense (qkv/proj/fc1/fc2) outputs are SAVED; only the
    #           batched attention einsums + softmax + elementwise chain
    #           recompute.  Measured SLOWER than full remat on v5e (the
    #           saved outputs are extra HBM materialization traffic —
    #           docs/BENCH.md "DiT remat A/B") — kept as the memory point
    #           between "attn" and True.
    #   "attn" = jax.checkpoint around ONLY the SDPA call: everything else
    #           keeps XLA's default AD; the fp32 softmax probs (the
    #           no-remat OOM cause at batch 128) are recomputed from the
    #           saved q/k/v — minimal recompute, no-remat fusion elsewhere
    remat: Any = False
    scan_blocks: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, y=None, *,
                 deterministic: bool = True, mode: str = "full",
                 cached=None, return_features: bool = False,
                 return_aux: bool = False) -> jnp.ndarray:
        if mode != "full" or return_features:
            raise ValueError(
                "encoder-cached sampling (mode/return_features) is U-Net-"
                "only — DiT has no encoder/decoder split to cache")
        cfg = self.config
        B, Hi, Wi, C = x.shape
        p = cfg.patch_size
        if Hi % p or Wi % p:
            raise ValueError(f"image {Hi}x{Wi} not divisible by patch {p}")
        hp, wp = Hi // p, Wi // p
        in_dtype = x.dtype
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # patchify: one reshape + one Dense (a single MXU matmul)
        tokens = x.astype(self.dtype).reshape(B, hp, p, wp, p, C)
        tokens = tokens.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp * wp, p * p * C)
        tokens = nn.Dense(cfg.hidden_size, name="patch_embed", **kw)(tokens)
        pos = jnp.asarray(_posemb_2d_sincos(hp, wp, cfg.hidden_size))
        tokens = tokens + pos.astype(self.dtype)[None]

        # conditioning vector: fp32 trig + fp32 MLP (like the U-Net TimeMLP)
        c = sinusoidal_time_embedding(t, cfg.time_embed_dim)
        c = nn.Dense(cfg.hidden_size, dtype=jnp.float32,
                     param_dtype=self.param_dtype, name="t_fc1")(c)
        c = nn.Dense(cfg.hidden_size, dtype=jnp.float32,
                     param_dtype=self.param_dtype, name="t_fc2")(nn.silu(c))
        # class conditioning: label embedding summed into c (the DiT paper's
        # recipe); y=None on a conditional model means the NULL token
        if cfg.num_classes:
            if y is None:
                y = jnp.full((B,), cfg.num_classes, jnp.int32)
            c = c + nn.Embed(
                cfg.num_classes + 1, cfg.hidden_size, dtype=jnp.float32,
                param_dtype=self.param_dtype, name="class_emb",
            )(jnp.asarray(y, jnp.int32))
        elif y is not None:
            raise ValueError("labels passed to an unconditional model "
                             "(DiTConfig.num_classes == 0)")

        block_kw = dict(
            hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio, dropout=cfg.dropout,
            deterministic=deterministic, attn_impl=self.attn_impl,
            num_experts=cfg.num_experts,
            capacity_factor=cfg.capacity_factor, **kw)
        if self.remat == "dots":
            Block = nn.remat(
                DiTBlock,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif self.remat == "attn":
            Block = DiTBlock
            block_kw["attn_remat"] = True
        elif self.remat:
            Block = nn.remat(DiTBlock)
        else:
            Block = DiTBlock
        if self.scan_blocks:
            ScanBlocks = nn.scan(
                Block,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=cfg.depth,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            tokens, aux = ScanBlocks(name="blocks", **block_kw)(tokens, c)
        else:
            auxes = []
            for i in range(cfg.depth):
                tokens, a = Block(name=f"block{i}", **block_kw)(tokens, c)
                auxes.append(a)
            aux = jnp.stack(auxes) if cfg.num_experts else None
        # mean over layers — one scalar regardless of depth (Switch eq. 4
        # applies the weight per layer; the mean keeps moe_aux_weight
        # comparable across depths)
        aux_total = (jnp.mean(aux.astype(jnp.float32))
                     if cfg.num_experts else jnp.zeros((), jnp.float32))

        # final adaLN + zero-init projection back to pixels
        mods = nn.Dense(2 * cfg.hidden_size, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="final_ada",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(nn.silu(c))
        shift, scale = [m[:, None, :] for m in jnp.split(mods, 2, axis=-1)]
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                          dtype=jnp.float32)
        h = (ln(tokens) * (1.0 + scale) + shift).astype(self.dtype)
        out = nn.Dense(p * p * cfg.in_channels, dtype=jnp.float32,
                       param_dtype=self.param_dtype, name="final_proj",
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros)(h)
        out = out.reshape(B, hp, wp, p, p, cfg.in_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hi, Wi, cfg.in_channels)
        out = out.astype(in_dtype)
        if return_aux:
            return out, aux_total
        return out


def dit_s4_64_config(**overrides) -> DiTConfig:
    """DiT-S/4 at 64px: 256 tokens, 384 wide, 12 deep (~21.6M params) —
    the small-scale point of arXiv:2212.09748 Table 1."""
    base = dict(in_channels=3, img_resolution=64, patch_size=4,
                hidden_size=384, depth=12, num_heads=6, mlp_ratio=4.0,
                dropout=0.0, time_embed_dim=256)
    base.update(overrides)
    return DiTConfig(**base)


def dit_b4_64_config(**overrides) -> DiTConfig:
    """DiT-B/4 at 64px: 768 wide, 12 deep (~85M params)."""
    base = dict(in_channels=3, img_resolution=64, patch_size=4,
                hidden_size=768, depth=12, num_heads=12, mlp_ratio=4.0,
                dropout=0.0, time_embed_dim=256)
    base.update(overrides)
    return DiTConfig(**base)


def dit_moe_64_config(**overrides) -> DiTConfig:
    """MoE-DiT-S/4 at 64px: the S/4 backbone with every block's MLP a
    switch-routed mixture of 8 experts (~103M params, ~22M active per
    token) — the expert-parallelism config (parallel/ep.py shards the
    expert axis over an ``expert`` mesh axis)."""
    base = dict(in_channels=3, img_resolution=64, patch_size=4,
                hidden_size=384, depth=12, num_heads=6, mlp_ratio=4.0,
                dropout=0.0, time_embed_dim=256, num_experts=8,
                capacity_factor=1.25, moe_aux_weight=0.01)
    base.update(overrides)
    return DiTConfig(**base)


def dit_s4_256_config(**overrides) -> DiTConfig:
    """DiT-S/4 at 256px: 4096 tokens — attention-dominated (4N^2H ≈ 2.6x
    the MLP FLOPs per block), which is exactly where the streamed Pallas
    flash kernel auto-engages (ops/attention.py: N >= 2048 on TPU) and
    where ring attention (attn_impl='ring') shards the sequence over a
    cp mesh axis."""
    base = dict(in_channels=3, img_resolution=256, patch_size=4,
                hidden_size=384, depth=12, num_heads=6, mlp_ratio=4.0,
                dropout=0.0, time_embed_dim=256)
    base.update(overrides)
    return DiTConfig(**base)
