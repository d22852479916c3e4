"""Procedural structured dataset: gaussian-blob "faces".

Zero-egress environments can't download CelebA, and iid-noise runs prove
nothing about learning dynamics (VERDICT round-1 item 3).  This dataset is
deterministic, infinite, and STRUCTURED — every image is a face-like
composition (tinted oval head on a colored background, two dark eyes, a
mouth bar) with per-sample randomized position/scale/colors — so a DDPM
trained on it must actually learn a joint distribution: falling loss,
probe-loss ordering (high-t easier than low-t), visibly face-like samples,
and a falling rFID are all observable within minutes of training.

Pure numpy rendering (coordinate grids + smooth masks), no PIL; index i is
rendered from fold_in(seed, i) so workers/shards agree without coordination.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BlobFacesDataset", "render_blob_face", "blob_faces_array"]


def _smooth_mask(d2: np.ndarray, radius: float, softness: float) -> np.ndarray:
    """1 inside, 0 outside, smooth edge: sigmoid((r - d)/softness)."""
    d = np.sqrt(d2)
    return 1.0 / (1.0 + np.exp(np.clip((d - radius) / max(softness, 1e-4), -30, 30)))


def _class_hue_rgb(class_id: int, num_classes: int) -> np.ndarray:
    """Class k's anchor color: hue k/num_classes on the HSV wheel (s=0.75,
    v=0.8) — maximally separated, so a classifier-free-guidance sample's
    class is visible at a glance."""
    h = (float(class_id) / max(num_classes, 1)) * 6.0
    c, x = 0.6, 0.6 * (1 - abs(h % 2 - 1))
    sector = [(c, x, 0), (x, c, 0), (0, c, x), (0, x, c), (x, 0, c), (c, 0, x)]
    r, g, b = sector[int(h) % 6]
    m = 0.8 - c
    return np.array([r + m, g + m, b + m], np.float32)


def render_blob_face(size: int, rng: np.random.Generator,
                     class_id: int = None, num_classes: int = 0) -> np.ndarray:
    """One (size, size, 3) float32 image in [-1, 1].

    With ``class_id``/``num_classes`` the background gradient anchors on the
    class hue (jittered +-0.08) instead of being fully random — the labeled
    variant for conditional training: the label is a visible attribute, so
    CFG sampling can be checked by eye and by pixel statistics."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size  # [0,1]^2

    # background: smooth vertical color gradient
    if class_id is not None:
        anchor = _class_hue_rgb(class_id, num_classes)
        bg_top = np.clip(anchor + rng.uniform(-0.08, 0.08, 3), 0, 1).astype(np.float32)
        bg_bot = np.clip(anchor * rng.uniform(0.55, 0.75) +
                         rng.uniform(-0.05, 0.05, 3), 0, 1).astype(np.float32)
    else:
        bg_top = rng.uniform(0.1, 0.9, size=3).astype(np.float32)
        bg_bot = rng.uniform(0.1, 0.9, size=3).astype(np.float32)
    img = bg_top[None, None, :] * (1 - yy[..., None]) + bg_bot[None, None, :] * yy[..., None]

    # head: tinted ellipse, jittered center/scale/aspect
    cx = rng.uniform(0.4, 0.6)
    cy = rng.uniform(0.42, 0.58)
    rx = rng.uniform(0.22, 0.3)
    ry = rx * rng.uniform(1.15, 1.4)
    skin = np.array([0.85, 0.65, 0.5], np.float32) * rng.uniform(0.7, 1.15)
    d2 = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2
    head = _smooth_mask(d2, 1.0, 0.06)[..., None]
    img = img * (1 - head) + np.clip(skin, 0, 1)[None, None, :] * head

    # eyes: two dark blobs, symmetric around the face center with jitter
    eye_dy = rng.uniform(-0.08, -0.02)
    eye_dx = rx * rng.uniform(0.35, 0.5)
    eye_r = rng.uniform(0.025, 0.045)
    eye_col = rng.uniform(0.0, 0.25, size=3).astype(np.float32)
    for sx in (-1.0, 1.0):
        ex = cx + sx * eye_dx + rng.uniform(-0.01, 0.01)
        ey = cy + eye_dy
        d2 = ((xx - ex) ** 2 + (yy - ey) ** 2) / eye_r**2
        m = _smooth_mask(d2, 1.0, 0.15)[..., None]
        img = img * (1 - m) + eye_col[None, None, :] * m

    # mouth: wide flat ellipse below center
    mx, my = cx + rng.uniform(-0.02, 0.02), cy + ry * rng.uniform(0.35, 0.55)
    mw = rx * rng.uniform(0.5, 0.9)
    mh = mw * rng.uniform(0.15, 0.3)
    mouth_col = np.array([0.6, 0.15, 0.2], np.float32) * rng.uniform(0.7, 1.2)
    d2 = ((xx - mx) / mw) ** 2 + ((yy - my) / mh) ** 2
    m = _smooth_mask(d2, 1.0, 0.12)[..., None]
    img = img * (1 - m) + np.clip(mouth_col, 0, 1)[None, None, :] * m

    return (np.clip(img, 0.0, 1.0) * 2.0 - 1.0).astype(np.float32)


class BlobFacesDataset:
    """Map-style dataset of procedural faces (``DataLoader``-compatible).

    ``num_classes > 0`` makes it a LABELED source: item ``i`` gets label
    ``i % num_classes`` and is rendered with that class's background hue —
    the zero-egress stand-in for a labeled dataset, used to train/test
    class-conditional models and classifier-free guidance end to end."""

    def __init__(self, n: int = 12800, img_size: int = 64, seed: int = 0,
                 num_classes: int = 0):
        self.n = int(n)
        self.img_size = int(img_size)
        self.seed = int(seed)
        self.num_classes = int(num_classes)

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, int(idx)])
        )
        if self.num_classes:
            y = int(idx) % self.num_classes
            return render_blob_face(self.img_size, rng, class_id=y,
                                    num_classes=self.num_classes), y
        return render_blob_face(self.img_size, rng), 0


def blob_faces_array(n: int, img_size: int = 64, seed: int = 0) -> np.ndarray:
    """(n, s, s, 3) array in [-1, 1] — convenience for tests/metrics."""
    ds = BlobFacesDataset(n, img_size, seed)
    return np.stack([ds[i][0] for i in range(n)])
