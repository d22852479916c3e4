"""Offline FID stand-in: Fréchet distance over random-CNN features (rFID).

The north star (BASELINE.md) is matched FID on CelebA-64, but Inception
weights need network access and this environment has none.  Random-init CNN
features are a well-studied substitute (features of an untrained conv net
retain enough image statistics for a Fréchet distance to rank sample quality
monotonically), and the extractor here is DETERMINISTIC: params come from a
fixed seed, so rFID numbers are comparable across runs and machines.

rFID is NOT FID — absolute values are not comparable to the literature.  It
is distribution-matched (mean+covariance of features of real vs generated
batches), monotone-improving on a learning run, and computable offline —
exactly the falsifiable "sample fidelity" signal VERDICT round-1 item 4
asked for.  Parity note: the reference has no quantitative quality metric
at all (its record is the README galleries, ``/root/reference/README.md:73-140``).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

__all__ = ["feature_extractor_params", "extract_features", "frechet_distance", "rfid"]

_FEAT_SEED = 1234  # fixed: rFID must be comparable across runs
_WIDTHS = (32, 64, 128, 128)


def _model():
    import flax.linen as nn
    import jax.numpy as jnp

    class RandomCNN(nn.Module):
        """Frozen random conv stack; global mean+std pooling of every stage
        (multi-scale features, 2*sum(widths) dims)."""

        @nn.compact
        def __call__(self, x):  # x: (N, H, W, C) in [0, 1]
            feats = []
            h = x * 2.0 - 1.0
            for i, w in enumerate(_WIDTHS):
                h = nn.Conv(w, (3, 3), strides=(2, 2), name=f"conv{i}")(h)
                h = nn.leaky_relu(h, 0.2)
                feats.append(jnp.mean(h, axis=(1, 2)))
                feats.append(jnp.std(h, axis=(1, 2)))
            return jnp.concatenate(feats, axis=-1)

    return RandomCNN()


@functools.lru_cache(maxsize=4)
def _init(img_size: int, channels: int):
    import jax
    import jax.numpy as jnp

    model = _model()
    params = model.init(
        jax.random.key(_FEAT_SEED), jnp.zeros((1, img_size, img_size, channels))
    )
    apply = jax.jit(lambda x: model.apply(params, x))
    return params, apply


def feature_extractor_params(img_size: int = 64, channels: int = 3):
    """The frozen extractor params (fixed seed — deterministic)."""
    return _init(img_size, channels)[0]


def extract_features(x01: np.ndarray, batch: int = 64) -> np.ndarray:
    """(N, D) fp64 features for images in [0, 1], NHWC."""
    x = np.asarray(x01, dtype=np.float32)
    if x.ndim != 4:
        raise ValueError(f"expected (N,H,W,C), got {x.shape}")
    _, apply = _init(x.shape[1], x.shape[-1])
    out = [np.asarray(apply(x[i : i + batch])) for i in range(0, len(x), batch)]
    return np.concatenate(out, axis=0).astype(np.float64)


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """||mu1-mu2||^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2}), numpy-only.

    The matrix sqrt uses the symmetric form sqrtm(C1)·C2·sqrtm(C1) via
    eigendecompositions (stable for PSD covariances; no scipy needed).
    """
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    diff = mu1 - mu2

    def psd_sqrt(c):
        w, v = np.linalg.eigh(c)
        w = np.clip(w, 0.0, None)
        return (v * np.sqrt(w)) @ v.T

    c1s = psd_sqrt(cov1 + eps * np.eye(len(cov1)))
    inner = c1s @ (cov2 + eps * np.eye(len(cov2))) @ c1s
    w = np.clip(np.linalg.eigvalsh(inner), 0.0, None)
    tr_sqrt = float(np.sum(np.sqrt(w)))
    d = float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)
    return max(d, 0.0)  # mathematically >= 0; eps-regularization can dip below


def _stats(feats: np.ndarray):
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(cov)


def rfid(real01: np.ndarray, gen01: np.ndarray) -> float:
    """Random-CNN-feature Fréchet distance between two [0,1] image batches.

    Use >= 64 images per side for a stable covariance; lower is better,
    0 means identical feature distributions.
    """
    f_real = extract_features(real01)
    f_gen = extract_features(gen01)
    return frechet_distance(*_stats(f_real), *_stats(f_gen))
