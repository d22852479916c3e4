"""Sample-quality metric tests."""

import numpy as np

from ddpm_diffusion_model_tpu.utils.sample_metrics import (
    channel_histogram,
    pairwise_diversity,
    sample_statistics,
)


def test_sample_statistics_uniform():
    rng = np.random.default_rng(0)
    x = rng.random((8, 16, 16, 3)).astype(np.float32)
    s = sample_statistics(x)
    assert 0.45 < s["mean"] < 0.55
    assert s["finite"]
    assert s["diversity"] > 0.2


def test_diversity_zero_for_identical():
    x = np.ones((4, 8, 8, 3), np.float32) * 0.5
    assert pairwise_diversity(x) == 0.0
    assert sample_statistics(x)["diversity"] == 0.0


def test_saturation_fractions():
    x = np.zeros((2, 4, 4, 3), np.float32)
    x[1] = 1.0
    s = sample_statistics(x)
    assert s["saturated_low_frac"] == 0.5
    assert s["saturated_high_frac"] == 0.5


def test_channel_histogram():
    x = np.zeros((2, 4, 4, 3), np.float32)
    x[..., 1] = 0.999
    h = channel_histogram(x, bins=10)
    assert h.shape == (3, 10)
    np.testing.assert_allclose(h.sum(axis=1), 1.0)
    assert h[0, 0] == 1.0 and h[1, -1] == 1.0
