"""Experiment configs: the typed bundle the reference never had.

The reference's "config system" is 30+ keyword arguments per entry point and
notebook cells as config records (SURVEY.md §5).  Here one frozen
:class:`ExperimentConfig` bundles the three typed sub-configs plus run
settings, serializes to/from JSON (stored inside checkpoints' meta), and
ships the three notebook presets as named factories.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

from ..models.unet import (
    UNetConfig,
    unet_256x256_config,
    unet_64x64_config,
    unet_64x64_low_config,
)
from ..ops.schedules import DiffusionConfig
from ..training.state import TrainConfig

__all__ = ["ExperimentConfig", "PRESETS", "get_preset"]


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: Any  # UNetConfig | DiTConfig (family-dispatched in from_dict)
    diffusion: DiffusionConfig
    train: TrainConfig
    # run settings
    run_name: str = "ddpm"
    img_size: int = 64
    batch_size: int = 128
    epochs: int = 50
    sample_every: int = 5
    sample_n: int = 36
    save_every: int = 5
    log_every: int = 0
    seed: int = 0
    remat: bool = False

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        # asdict recurses the dataclass fields and would drop DiTConfig's
        # "family" discriminator — route through the sub-config's own dict
        d["model"] = self.model.to_dict()
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any], *, legacy: bool = False) -> "ExperimentConfig":
        """``legacy=True`` only when loading a checkpoint meta (reproduces
        pre-r2 optimizer/RNG behaviors for old checkpoints — see
        TrainConfig.from_dict); fresh config files get modern defaults."""
        d = dict(d)
        if d["model"].get("family", "unet") == "dit":
            from ..models.dit import DiTConfig

            d["model"] = DiTConfig.from_dict(d["model"])
        else:
            d["model"] = UNetConfig.from_dict(d["model"])
        d["diffusion"] = DiffusionConfig.from_dict(d["diffusion"])
        d["train"] = TrainConfig.from_dict(d["train"], legacy=legacy)
        return cls(**d)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        return cls.from_dict(json.loads(s))


def _preset_low() -> ExperimentConfig:
    """The Low-GPU notebook run (BASELINE.md rows 1/2/5/7)."""
    return ExperimentConfig(
        model=unet_64x64_low_config(),
        diffusion=DiffusionConfig(T=1000, schedule="linear", img_size=64),
        train=TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=1,
                          ema_decay=0.9995),
        run_name="celeba64_low", img_size=64, batch_size=32, epochs=10,
    )


def _preset_attn() -> ExperimentConfig:
    """The Attention notebook run (BASELINE.md row 3)."""
    return ExperimentConfig(
        model=unet_64x64_config(),
        diffusion=DiffusionConfig(
            T=1000, schedule="linear", img_size=64, dynamic_threshold=0.95
        ),
        train=TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=1,
                          ema_decay=0.9997),
        run_name="celeba64_attn", img_size=64, batch_size=128, epochs=50,
    )


def _preset_hq256() -> ExperimentConfig:
    """The CelebA-HQ-256 notebook run (BASELINE.md rows 4/6/8)."""
    return ExperimentConfig(
        model=unet_256x256_config(),
        diffusion=DiffusionConfig(
            T=1000, schedule="linear", img_size=256, dynamic_threshold=0.995
        ),
        train=TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=8,
                          ema_decay=0.9997),
        run_name="celebahq256", img_size=256, batch_size=64, epochs=50,
        remat=True,
    )


def _preset_dit() -> ExperimentConfig:
    """Beyond-reference: the DiT-S/4 transformer denoiser at 64px (second
    model family, models/dit.py).  Training hyperparameters mirror the
    attention preset so throughput/quality compare apples-to-apples."""
    from ..models.dit import dit_s4_64_config

    return ExperimentConfig(
        model=dit_s4_64_config(),
        diffusion=DiffusionConfig(
            T=1000, schedule="linear", img_size=64, dynamic_threshold=0.95
        ),
        train=TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=1,
                          ema_decay=0.9997),
        run_name="celeba64_dit_s4", img_size=64, batch_size=128, epochs=50,
    )


def _preset_dit_moe() -> ExperimentConfig:
    """Beyond-reference: MoE-DiT-S/4 (8 experts, switch top-1 routing,
    models/moe.py) — the expert-parallelism config.  ~103M params with the
    per-token compute of the dense S/4; shard the expert axis over an
    ``expert`` mesh axis via parallel/ep.py."""
    from ..models.dit import dit_moe_64_config

    return ExperimentConfig(
        model=dit_moe_64_config(),
        diffusion=DiffusionConfig(
            T=1000, schedule="linear", img_size=64, dynamic_threshold=0.95
        ),
        train=TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=1,
                          ema_decay=0.9997),
        run_name="celeba64_dit_moe", img_size=64, batch_size=128, epochs=50,
    )


def _preset_sr64to256() -> ExperimentConfig:
    """Beyond-reference: the 64->256 SR upsampler stage of a cascade
    (SR3 / Cascaded Diffusion; ops/superres.py).  The 256px notebook
    architecture with 3 conditioning channels; pairs with any 64px base
    checkpoint via the ``cascade`` CLI command."""
    return ExperimentConfig(
        model=unet_256x256_config(cond_channels=3),
        diffusion=DiffusionConfig(
            T=1000, schedule="linear", img_size=256, dynamic_threshold=0.995
        ),
        train=TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=8,
                          ema_decay=0.9997, superres_factor=4, cond_aug=0.1),
        run_name="sr64to256", img_size=256, batch_size=64, epochs=50,
        remat=True,
    )


def _preset_latent() -> ExperimentConfig:
    """Beyond-reference: 64px latent diffusion (LDM, Rombach et al. 2022).
    The denoiser runs on an f=4 KL-VAE's 16x16x4 latents
    (models/autoencoder.py vae_64x_config); train with
    ``train --preset celeba64_latent --latent-vae <vae_ckpt>`` after
    ``train-vae``, sample with ``sample-* --vae <vae_ckpt>``.  clamp_x0 is
    OFF — latents are unbounded (sampling/latent.py check_latent_config)."""
    from ..models.unet import unet_latent16_config

    return ExperimentConfig(
        model=unet_latent16_config(),
        diffusion=DiffusionConfig(T=1000, schedule="linear", img_size=16,
                                  clamp_x0=False),
        train=TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=1,
                          ema_decay=0.9997),
        run_name="celeba64_latent", img_size=16, batch_size=128, epochs=50,
    )


PRESETS = {
    "celeba64_low": _preset_low,
    "celeba64_attn": _preset_attn,
    "celebahq256": _preset_hq256,
    "celeba64_dit_s4": _preset_dit,
    "celeba64_dit_moe": _preset_dit_moe,
    "sr64to256": _preset_sr64to256,
    "celeba64_latent": _preset_latent,
}


def get_preset(name: str) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]()
