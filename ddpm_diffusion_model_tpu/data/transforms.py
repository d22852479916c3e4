"""Image preprocessing: the reference's CelebA transform chain, NumPy/PIL.

Parity targets: torchvision CelebA chain CenterCrop(178) -> Resize(img_size)
-> ToTensor -> Normalize(0.5, 0.5) => [-1, 1] (``load_data_from_torch.py:34-39``),
with the zip loader's extra leading Resize(178) (``load_data_local.py``), all
NHWC float32 here (TPU layout; the reference's CHW + channels_last flag is
the NCHW workaround we drop).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

__all__ = [
    "center_crop",
    "resize_pil",
    "to_unit_range",
    "make_celeba_transform",
    "denormalize",
]


def center_crop(img, size: int):
    """PIL center crop to at most (size, size).

    Undersized images are clamped to their own extent (the subsequent
    resize upscales them) rather than padded with black borders — matching
    the native C++ path (``image_pipeline.cpp center_crop``) so the two
    decode paths stay pixel-deterministic for the same file.  (torchvision
    CenterCrop would zero-pad, but never does on real 178x218 CelebA.)"""
    w, h = img.size
    cw, ch = min(size, w), min(size, h)
    left = (w - cw) // 2
    top = (h - ch) // 2
    return img.crop((left, top, left + cw, top + ch))


def resize_pil(img, size: Tuple[int, int]):
    from PIL import Image

    return img.resize(size, Image.BILINEAR)


def to_unit_range(img) -> np.ndarray:
    """PIL RGB -> float32 NHWC in [-1, 1] (ToTensor + Normalize(0.5, 0.5))."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def make_celeba_transform(
    img_size: int = 64,
    crop: int = 178,
    initial_resize: Optional[int] = None,
) -> Callable:
    """The reference chain as one PIL->ndarray function.

    ``initial_resize`` reproduces the zip loader's leading Resize(178)
    (applied to the *shorter* logic torchvision uses: resize makes the
    smaller edge == size, keeping aspect).
    """

    def transform(img) -> np.ndarray:  # noqa: D401
        if initial_resize is not None:
            w, h = img.size
            if w < h:
                img = resize_pil(img, (initial_resize, int(h * initial_resize / w)))
            else:
                img = resize_pil(img, (int(w * initial_resize / h), initial_resize))
        if crop is not None:
            img = center_crop(img, crop)
        if img.size != (img_size, img_size):
            img = resize_pil(img, (img_size, img_size))
        return to_unit_range(img)

    # marker consumed by ImageFolderDataset: the native C++ pipeline is only
    # a drop-in for THIS exact chain, so it keys on these attributes instead
    # of guessing from separate arguments
    transform._celeba_chain = dict(
        img_size=img_size, crop=crop, initial_resize=initial_resize
    )
    return transform


def denormalize(x: np.ndarray) -> np.ndarray:
    """[-1,1] -> [0,1] clipped."""
    return np.clip((np.asarray(x) + 1.0) * 0.5, 0.0, 1.0)
