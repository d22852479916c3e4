from .blocks import AttnBlock, Downsample, ResBlock, Upsample, group_norm  # noqa: F401
from .embeddings import TimeMLP, sinusoidal_time_embedding  # noqa: F401
from .unet import (  # noqa: F401
    UNetConfig,
    UNetDenoiser,
    count_params,
    unet_256x256_config,
    unet_64x64_config,
    unet_64x64_low_config,
)
