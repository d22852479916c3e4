"""Network-gated data tests — mirror the reference's [SKIP]-on-unavailable
pattern (``testing/test_data_loading.py:43-45``).  In the zero-egress CI
environment these skip; with network they exercise the HF CelebA-HQ path."""

import numpy as np
import pytest


def test_hf_celebahq_loader_or_skip():
    try:
        from ddpm_diffusion_model_tpu.data import build_hf_image_loader

        loader = build_hf_image_loader(img_size=256, batch_size=2, num_workers=1)
    except Exception as e:
        pytest.skip(f"HF dataset unavailable: {type(e).__name__}")
    x, y = next(iter(loader))
    assert x.shape == (2, 256, 256, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert np.isfinite(x).all()


def test_torchvision_celeba_or_skip(tmp_path):
    pytest.importorskip("torchvision")
    try:
        from ddpm_diffusion_model_tpu.data import get_celeba_loaders

        train, valid, test = get_celeba_loaders(
            data_dir=str(tmp_path), img_size=64, batch_size=4, download=True
        )
        x, _ = next(iter(train))
    except Exception as e:
        pytest.skip(f"CelebA download unavailable: {type(e).__name__}")
    assert x.shape == (4, 64, 64, 3)
