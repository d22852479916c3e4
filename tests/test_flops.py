"""Analytic FLOP accounting: verified against XLA's cost analysis (which
under-counts scan bodies — the bug that produced round 1's wrong MFU)."""

import jax
import jax.numpy as jnp
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.utils.flops import (
    mfu,
    sampling_flops,
    train_step_flops,
    unet_fwd_flops,
)

CFG = UNetConfig(
    base_channels=32, channel_mults=(1, 2), num_res_blocks=1,
    attn_resolutions=(8,), time_embed_dim=64, num_heads=2, head_dim=16,
    img_resolution=16,
)


def test_fwd_flops_matches_xla_cost_analysis():
    """Within a few % of XLA's count (XLA excludes SAME-padding border MACs
    and adds elementwise flops; both effects are small)."""
    model = UNetDenoiser(CFG, dtype=jnp.float32)
    B = 4
    x = jnp.ones((B, 16, 16, 3))
    t = jnp.zeros((B,))
    params = model.init(jax.random.key(0), x, t)
    comp = jax.jit(lambda p, x, t: model.apply(p, x, t)).lower(params, x, t).compile()
    ca = comp.cost_analysis()
    xla = ca["flops"] if isinstance(ca, dict) else ca[0]["flops"]
    ours = unet_fwd_flops(CFG, B)
    assert abs(ours - xla) / xla < 0.15


def test_flops_scale_linearly_in_batch():
    assert unet_fwd_flops(CFG, 8) == 2 * unet_fwd_flops(CFG, 4)


def test_train_and_sampling_accounting():
    assert train_step_flops(CFG, 4) == 3 * unet_fwd_flops(CFG, 4)
    assert sampling_flops(CFG, 4, 50) == 50 * unet_fwd_flops(CFG, 4)


def test_mfu():
    assert mfu(197e12, 1.0) == pytest.approx(1.0)
    assert mfu(197e12 / 2, 1.0) == pytest.approx(0.5)


def test_hq256_step_flops_magnitude():
    """The CelebA-HQ-256 step (eff. batch 64) is ~80 TFLOP — the number that
    exposes the grad-accum scan under-count (XLA reported ~20)."""
    from ddpm_diffusion_model_tpu.models import unet_256x256_config

    f = train_step_flops(unet_256x256_config(), 64)
    assert 70e12 < f < 95e12
