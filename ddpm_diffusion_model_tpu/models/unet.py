"""Time-conditioned U-Net epsilon-predictor (NHWC, Flax linen).

TPU-native redesign of ``src/model/unet_backbone.py:68-240``, reproducing the
reference's exact (nonstandard) topology so parameter counts and behavior
match:

- encoder: per level ``num_res_blocks`` ResBlocks (attention appended after
  each ResBlock when the level's resolution is in ``attn_resolutions``);
  **one skip saved per level** (after its blocks, before downsample —
  ``unet_backbone.py:119,185`` — not per-block like Ho's U-Net); stride-2
  conv downsample between levels (none after the last).
- bottleneck: Res → (Attn if bottleneck res in set) → Res.
- decoder: per reversed level, Upsample first (skipped at level 0), nearest
  resize on spatial mismatch, concat skip, one concat-ResBlock
  (cur+skip → out) then ``num_res_blocks`` more.  **No attention in the
  decoder** (parity with ``unet_backbone.py:147-153``).
- head: GN → SiLU → 3x3 conv to ``in_channels``.

Instead of the reference's isinstance-dispatched ModuleLists the whole level
plan is computed once in ``UNetConfig.level_plan`` and consumed by both the
encoder and decoder — the single-source-of-truth fix SURVEY.md §7 calls for.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import AttnBlock, Downsample, ResBlock, Upsample, group_norm
from .embeddings import TimeMLP, sinusoidal_time_embedding

__all__ = ["UNetConfig", "UNetDenoiser", "unet_64x64_config", "unet_64x64_low_config",
           "unet_256x256_config", "count_params"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """All architecture knobs of the reference U-Net
    (``unet_backbone.py:78-88`` ctor args), promoted to a typed config."""

    in_channels: int = 3
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16, 8)
    time_embed_dim: int = 512
    dropout: float = 0.0
    attn_p_drop: float = 0.0  # SDPA attention-weight dropout (attention.py:43)
    num_heads: int = 4
    head_dim: int = 64
    img_resolution: int = 64
    # class-conditional generation (0 = unconditional, parity with the
    # reference's only mode): labels y in {0..num_classes-1} are embedded
    # and added to the time embedding; index num_classes is the learned
    # NULL token used for classifier-free guidance (Ho & Salimans 2022)
    num_classes: int = 0
    # image-conditional denoising (0 = none): ``x_cond`` with this many
    # channels is concatenated to x_t before the stem conv — the SR3 /
    # cascaded-diffusion upsampler conditioning (ops/superres.py).  The
    # reference has no image conditioning of any kind.
    cond_channels: int = 0

    def level_plan(self):
        """Per-level (resolution, out_ch, attn?) for the encoder, plus the
        bottleneck resolution.  Resolution halves after every non-final
        level, exactly like ``unet_backbone.py:105-128``."""
        levels = []
        res = self.img_resolution
        for i, mult in enumerate(self.channel_mults):
            is_last = i == len(self.channel_mults) - 1
            levels.append(
                dict(
                    resolution=res,
                    out_ch=self.base_channels * mult,
                    use_attn=res in set(self.attn_resolutions),
                    downsample=not is_last,
                )
            )
            if not is_last:
                res //= 2
        return levels, res  # (levels, bottleneck_resolution)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)  # no "family" key == unet (legacy)

    @classmethod
    def from_dict(cls, d: dict) -> "UNetConfig":
        d = dict(d)
        fam = d.pop("family", "unet")
        if fam != "unet":
            raise ValueError(f"not a UNet config (family={fam!r})")
        d["channel_mults"] = tuple(d["channel_mults"])
        d["attn_resolutions"] = tuple(d["attn_resolutions"])
        return cls(**d)


class UNetDenoiser(nn.Module):
    """epsilon-hat = UNet(x_t, t); x NHWC in [-1, 1], t (B,) int/float."""

    config: UNetConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    remat: Any = False  # ResBlock rematerialization — the TPU replacement
    #                     for the reference's OOM-skip (SURVEY.md §7):
    #                     True  = full remat (recompute everything; the
    #                             256px memory lever)
    #                     "masks" = targeted policy: save every intermediate
    #                             EXCEPT the named dropout bits, so only the
    #                             uint8 masks regenerate in the backward —
    #                             trades ~1 ms of rbg bits for the saved-mask
    #                             HBM round trip (docs/BENCH.md 64px
    #                             attribution)
    fused_gn: bool = False  # tiled Pallas GN+SiLU+time-bias epilogue
    #                         (ops.fused_norm); opt-in per measurement
    dropout_impl: str = "packed"  # "packed" (ops.dropout, 8 bits/elem,
    #                               rate quantized to 1/256) | "flax"
    #                               (exact-bernoulli nn.Dropout)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        *,
        x_cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        mode: str = "full",
        cached=None,
        return_features: bool = False,
    ) -> jnp.ndarray:
        """epsilon-hat prediction.

        ``mode``/``cached``/``return_features`` support **encoder-cached fast
        sampling** (Faster-Diffusion / DeepCache style — encoder features
        vary slowly across adjacent timesteps, so reuse steps can skip the
        encoder+bottleneck entirely):

        - ``mode="full"``: normal forward. With ``return_features=True``
          returns ``(eps, (mid, skips))`` for a later reuse step.
        - ``mode="decode"``: skip the encoder; ``cached=(mid, skips)`` from
          an earlier step feeds the decoder, which runs with the FRESH time
          embedding.  Param tree is unchanged (explicit submodule names) —
          any checkpoint works with both modes.
        """
        cfg = self.config
        levels, bottleneck_res = cfg.level_plan()
        if self.remat == "masks":
            # save everything EXCEPT the named uint8 dropout bits: backward
            # regenerates only the masks (ops/dropout.py names them)
            Res = nn.remat(
                ResBlock,
                policy=jax.checkpoint_policies.save_anything_except_these_names(
                    "dropout_bits"),
            )
        elif self.remat:
            Res = nn.remat(ResBlock)
        else:
            Res = ResBlock
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        res_kw = dict(dropout=cfg.dropout, deterministic=deterministic,
                      fused_gn=self.fused_gn, dropout_impl=self.dropout_impl,
                      **kw)
        attn_kw = dict(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim,
            p_drop=cfg.attn_p_drop, deterministic=deterministic,
            attn_impl=self.attn_impl, **kw,
        )

        # time embedding (fp32 trig, then model-dtype MLP outputs fp32 bias base)
        t_emb = sinusoidal_time_embedding(t, cfg.time_embed_dim)
        t_emb = TimeMLP(cfg.time_embed_dim, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="time_mlp")(t_emb)
        # class conditioning: label embedding added to the time embedding
        # (y=None on a conditional model means the NULL/unconditional token,
        # so unconditional sampling needs no special-casing anywhere)
        if cfg.num_classes:
            if y is None:
                y = jnp.full((x.shape[0],), cfg.num_classes, jnp.int32)
            t_emb = t_emb + nn.Embed(
                cfg.num_classes + 1, cfg.time_embed_dim, dtype=jnp.float32,
                param_dtype=self.param_dtype, name="class_emb",
            )(jnp.asarray(y, jnp.int32))
        elif y is not None:
            raise ValueError("labels passed to an unconditional model "
                             "(UNetConfig.num_classes == 0)")

        # image conditioning (SR upsampler): concat x_cond channelwise before
        # the stem conv.  In "decode" mode the encoder (which consumed the
        # cond) is skipped, so x_cond is accepted and ignored there.
        if cfg.cond_channels:
            if x_cond is None:
                raise ValueError(
                    "image-conditional model (cond_channels > 0) requires "
                    "x_cond — build it with ops.superres.upsample_cond")
            if x_cond.shape[-1] != cfg.cond_channels:
                raise ValueError(
                    f"x_cond has {x_cond.shape[-1]} channels, config says "
                    f"cond_channels={cfg.cond_channels}")
            if mode == "full":
                x = jnp.concatenate([x, x_cond.astype(x.dtype)], axis=-1)
        elif x_cond is not None:
            raise ValueError("x_cond passed to a model without cond_channels")

        in_dtype = x.dtype
        if mode == "decode":
            if cached is None:
                raise ValueError('mode="decode" requires cached=(mid, skips)')
            cur, skips = cached
            cur = cur.astype(self.dtype)
            skips = [s.astype(self.dtype) for s in skips]
        elif mode == "full":
            cur = nn.Conv(cfg.base_channels, (3, 3), padding="SAME",
                          name="in_conv", **kw)(x.astype(self.dtype))

            # ---- encoder ----
            skips = []
            for li, level in enumerate(levels):
                for bi in range(cfg.num_res_blocks):
                    cur = Res(level["out_ch"], name=f"down{li}_res{bi}",
                              **res_kw)(cur, t_emb)
                    if level["use_attn"]:
                        cur = AttnBlock(name=f"down{li}_attn{bi}", **attn_kw)(cur)
                skips.append(cur)  # one skip per level, pre-downsample
                if level["downsample"]:
                    cur = Downsample(level["out_ch"], name=f"down{li}_down",
                                     **kw)(cur)

            # ---- bottleneck ----
            mid_ch = levels[-1]["out_ch"]
            cur = Res(mid_ch, name="mid_res0", **res_kw)(cur, t_emb)
            if bottleneck_res in set(cfg.attn_resolutions):
                cur = AttnBlock(name="mid_attn", **attn_kw)(cur)
            cur = Res(mid_ch, name="mid_res1", **res_kw)(cur, t_emb)
        else:
            raise ValueError(f"unknown mode {mode!r}")

        features = (cur, tuple(skips)) if return_features else None
        skips = list(skips)

        # ---- decoder (reversed levels; no attention — parity) ----
        for li, level in enumerate(reversed(levels)):
            if li > 0:
                cur = Upsample(cur.shape[-1], name=f"up{li}_up", **kw)(cur)
            skip = skips.pop()
            if cur.shape[1:3] != skip.shape[1:3]:
                cur = jax.image.resize(
                    cur, (cur.shape[0], *skip.shape[1:3], cur.shape[-1]),
                    method="nearest")
            cur = jnp.concatenate([cur, skip.astype(cur.dtype)], axis=-1)
            out_ch = level["out_ch"]
            cur = Res(out_ch, name=f"up{li}_res0", **res_kw)(cur, t_emb)
            for bi in range(cfg.num_res_blocks):
                cur = Res(out_ch, name=f"up{li}_res{bi + 1}", **res_kw)(
                    cur, t_emb)

        # ---- head ----
        cur = group_norm(cur.shape[-1], dtype=self.dtype, name="out_norm")(cur)
        cur = nn.silu(cur).astype(self.dtype)
        out = nn.Conv(cfg.in_channels, (3, 3), padding="SAME", name="out_conv",
                      dtype=jnp.float32, param_dtype=self.param_dtype)(cur)
        out = out.astype(in_dtype)
        return (out, features) if return_features else out


def unet_64x64_config(**overrides) -> UNetConfig:
    """Defaults of ``build_unet_64x64`` (``unet_backbone.py:219-240``)."""
    base = dict(
        in_channels=3, base_channels=128, channel_mults=(1, 2, 2, 2),
        num_res_blocks=2, attn_resolutions=(16, 8), time_embed_dim=512,
        dropout=0.1, num_heads=4, head_dim=64, img_resolution=64,
    )
    base.update(overrides)
    return UNetConfig(**base)


def unet_64x64_low_config(**overrides) -> UNetConfig:
    """The "low-GPU" notebook config (BASELINE.md row 1): base 96, one
    resblock, attention only at 8x8 with 2 heads x 32."""
    base = dict(
        in_channels=3, base_channels=96, channel_mults=(1, 2, 2, 2),
        num_res_blocks=1, attn_resolutions=(8,), time_embed_dim=384,
        dropout=0.0, num_heads=2, head_dim=32, img_resolution=64,
    )
    base.update(overrides)
    return UNetConfig(**base)


def unet_latent16_config(**overrides) -> UNetConfig:
    """Latent-diffusion denoiser for the 64px LDM recipe: runs on the f=4
    KL-VAE's 16x16x4 latents (models/autoencoder.py vae_64x_config) instead
    of 64x64x3 pixels — the Rombach et al. 2022 compute trade the reference
    (pixel-only, ``unet_backbone.py``) never had.  Width matches the 64px
    attention config's core; pair with ``DiffusionConfig(clamp_x0=False)``
    (latents are unbounded)."""
    base = dict(
        in_channels=4, base_channels=128, channel_mults=(1, 2, 2),
        num_res_blocks=2, attn_resolutions=(8,), time_embed_dim=512,
        dropout=0.1, num_heads=4, head_dim=64, img_resolution=16,
    )
    base.update(overrides)
    return UNetConfig(**base)


def unet_256x256_config(**overrides) -> UNetConfig:
    """The CelebA-HQ-256 notebook config (SURVEY.md §2.2 row "256x256"):
    mults (1,1,2,2,4), attention at 16x16 only."""
    base = dict(
        in_channels=3, base_channels=128, channel_mults=(1, 1, 2, 2, 4),
        num_res_blocks=2, attn_resolutions=(16,), time_embed_dim=512,
        dropout=0.0, num_heads=4, head_dim=64, img_resolution=256,
    )
    base.update(overrides)
    return UNetConfig(**base)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
