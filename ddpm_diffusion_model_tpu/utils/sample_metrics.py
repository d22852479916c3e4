"""Quantitative sample-quality observability.

The reference's only quality signal is visual (sample grids / strips,
SURVEY.md §5 "metrics/observability").  These cheap statistics catch mode
collapse, saturation, and divergence numerically during training — useful
where FID is unavailable (inception weights need network access).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["sample_statistics", "pairwise_diversity", "channel_histogram"]


def sample_statistics(x01: np.ndarray) -> Dict[str, float]:
    """Summary stats for a batch of [0,1] samples (N, H, W, C)."""
    x = np.asarray(x01, dtype=np.float32)
    sat_lo = float((x <= 1 / 255).mean())
    sat_hi = float((x >= 254 / 255).mean())
    return {
        "mean": float(x.mean()),
        "std": float(x.std()),
        "min": float(x.min()),
        "max": float(x.max()),
        "saturated_low_frac": sat_lo,
        "saturated_high_frac": sat_hi,
        "diversity": pairwise_diversity(x),
        "finite": bool(np.isfinite(x).all()),
    }


def pairwise_diversity(x01: np.ndarray, max_pairs: int = 64) -> float:
    """Mean pairwise RMS distance between samples — near 0 signals mode
    collapse (all samples identical)."""
    x = np.asarray(x01, dtype=np.float32)
    n = x.shape[0]
    if n < 2:
        return 0.0
    flat = x.reshape(n, -1)
    rng = np.random.default_rng(0)
    dists = []
    for _ in range(min(max_pairs, n * (n - 1) // 2)):
        i, j = rng.choice(n, size=2, replace=False)
        dists.append(np.sqrt(np.mean((flat[i] - flat[j]) ** 2)))
    return float(np.mean(dists))


def channel_histogram(x01: np.ndarray, bins: int = 16) -> np.ndarray:
    """(C, bins) normalized histograms — compare against the data
    distribution to spot drift."""
    x = np.asarray(x01, dtype=np.float32)
    c = x.shape[-1]
    out = np.zeros((c, bins), np.float32)
    for ci in range(c):
        h, _ = np.histogram(x[..., ci], bins=bins, range=(0.0, 1.0))
        out[ci] = h / max(1, h.sum())
    return out
