"""ddpm_diffusion_model_tpu — a TPU-native (JAX/Flax/Pallas/pjit) denoising
diffusion framework with the full capability surface of the PyTorch reference
``pablo-reyes8/ddpm-diffusion-model``, redesigned idiomatically for TPU.

Subpackages
-----------
- ``ops``       diffusion math (schedules, q_sample, loss, DDPM/DDIM steps)
                and Pallas TPU kernels for the hot ops
- ``models``    NHWC Flax U-Net denoiser (ResBlocks, attention, time embedding)
- ``sampling``  ``lax.scan`` samplers: DDPM ancestral, DDIM (all schedules),
                denoise-strip capture
- ``training``  jitted train step (bf16, grad-accum, clip, warmup, EMA),
                epoch driver, checkpoint/resume
- ``data``      CelebA / CelebA-HQ pipelines (torchvision, zip/folder, HF)
- ``parallel``  device mesh + sharding (DP/FSDP over ICI)
- ``utils``     image grids, configs, logging
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
