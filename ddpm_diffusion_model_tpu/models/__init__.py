from .blocks import AttnBlock, Downsample, ResBlock, Upsample, group_norm  # noqa: F401
from .dit import (  # noqa: F401
    DiTConfig,
    DiTDenoiser,
    dit_b4_64_config,
    dit_moe_64_config,
    dit_s4_256_config,
    dit_s4_64_config,
)
from .autoencoder import (  # noqa: F401
    AutoEncoderConfig,
    AutoEncoderKL,
    latent_scale_factor,
    vae_16x_config,
    vae_64x_config,
)
from .moe import MoEMlp  # noqa: F401
from .embeddings import TimeMLP, sinusoidal_time_embedding  # noqa: F401
from .unet import (  # noqa: F401
    UNetConfig,
    UNetDenoiser,
    count_params,
    unet_256x256_config,
    unet_64x64_config,
    unet_64x64_low_config,
    unet_latent16_config,
)


def build_denoiser(model_config, **kwargs):
    """Family dispatch: the right denoiser module for a model config.

    Both families share the call contract ``eps = model(x_nhwc, t,
    deterministic=...)``, so callers (train step, samplers, serving, CLI)
    never branch on family again after this point.  UNet-only constructor
    knobs (``fused_gn``, ``dropout_impl``) are rejected for DiT rather than
    silently dropped.
    """
    if isinstance(model_config, DiTConfig):
        bad = set(kwargs) - {"dtype", "param_dtype", "attn_impl", "remat",
                             "scan_blocks"}
        if bad:
            raise TypeError(f"UNet-only options for DiT: {sorted(bad)}")
        return DiTDenoiser(model_config, **kwargs)
    return UNetDenoiser(model_config, **kwargs)
