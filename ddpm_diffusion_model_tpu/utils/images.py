"""Image-grid utilities (host-side, NumPy + PIL).

TPU-native replacement for the reference's torchvision ``make_grid`` /
``save_image`` usage (``training_utils.py:33-50``, ``ddpm_inference.py:40-45``):
arrays are NHWC float in [0, 1]; grids are assembled in NumPy after a single
device->host transfer, PNGs written with PIL.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["make_grid", "save_image", "save_image_grid", "load_image",
           "grid_nrow"]


def grid_nrow(n: int) -> int:
    """Images per row for an n-image square-ish grid — the reference's
    int(sqrt(n))-for-perfect-squares / ceil otherwise rule
    (``ddpim_inference.py:90``), which reduces to ceil(sqrt(n))."""
    return int(np.ceil(np.sqrt(max(1, int(n)))))


def load_image(
    path: str,
    size: Optional[int] = None,
    *,
    grayscale: bool = False,
) -> np.ndarray:
    """Read a PNG/JPEG (path or file-like object) into an (H, W, C)
    float32 array in [0, 1].

    ``size``: center-crop to square then resize to (size, size) — the same
    geometry the data transforms apply, so a CLI-loaded image matches what
    the model trained on.  ``grayscale=True`` yields C=1 (mask loading).
    """
    from PIL import Image

    img = Image.open(path)
    img = img.convert("L" if grayscale else "RGB")
    if size is not None:
        w, h = img.size
        side = min(w, h)
        left, top = (w - side) // 2, (h - side) // 2
        img = img.crop((left, top, left + side, top + side))
        img = img.resize((int(size), int(size)), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def make_grid(
    images: np.ndarray,
    nrow: Optional[int] = None,
    padding: int = 2,
    pad_value: float = 0.0,
) -> np.ndarray:
    """Tile (N, H, W, C) images into one (H', W', C) grid.

    Matches torchvision semantics used by the reference: ``nrow`` is the
    number of images per row; default nrow = ceil(sqrt(N)) (the reference
    uses int(sqrt(n)) for perfect squares and ceil otherwise,
    ``ddpim_inference.py:90``).
    """
    x = np.asarray(images, dtype=np.float32)
    if x.ndim != 4:
        raise ValueError(f"expected (N,H,W,C), got {x.shape}")
    n, h, w, c = x.shape
    if nrow is None:
        r = int(np.sqrt(n))
        nrow = r if r * r == n else int(np.ceil(np.sqrt(n)))
    nrow = max(1, int(nrow))
    ncol = int(np.ceil(n / nrow))

    grid = np.full(
        (ncol * h + (ncol + 1) * padding, nrow * w + (nrow + 1) * padding, c),
        pad_value,
        dtype=np.float32,
    )
    for i in range(n):
        r, col = divmod(i, nrow)
        y0 = padding + r * (h + padding)
        x0 = padding + col * (w + padding)
        grid[y0 : y0 + h, x0 : x0 + w] = x[i]
    return grid


def save_image(image: np.ndarray, path: str) -> None:
    """Write one (H, W, C) or (H, W) float [0,1] array as PNG."""
    from PIL import Image

    dirpath = os.path.dirname(path)
    if dirpath:
        os.makedirs(dirpath, exist_ok=True)
    arr = np.asarray(image)
    arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def save_image_grid(
    images: np.ndarray,
    path: str,
    nrow: Optional[int] = None,
    padding: int = 2,
) -> np.ndarray:
    """Grid + save in one call (reference: ``training_utils.py:33-50``)."""
    grid = make_grid(images, nrow=nrow, padding=padding)
    save_image(grid, path)
    return grid
