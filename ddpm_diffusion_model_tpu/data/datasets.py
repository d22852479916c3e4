"""Dataset sources: image folders, zip archives, arrays, HF hub.

Capability parity with the reference's four data paths (SURVEY.md §2.4):

- ``ImageFolderDataset``   <- ``FlatImageDataset`` (``load_data_local.py``):
  recursive jpg/jpeg/png glob, corrupt-image tolerance via neighbor fallback
  (``load_data_local.py:77-88``) or zeros placeholder (``celebraHQ.py:56-61``).
- ``ensure_extracted`` + zip path  <- ``get_celeba_loader_from_zip``.
- ``HFImageDataset``       <- ``build_hf_image_loader`` (``celebraHQ.py``):
  eurecom-ds/celeba-hq-256, split "default" falling back to "train".
- ``ArrayDataset``         for synthetic/test data.
- ``SubsetDataset``        <- ``create_subset_dataloader`` (``subset_celebra.py``):
  seeded choice without replacement, default cap 100k.

Items are ``(image_f32_nhwc, label)`` — label 0 like the reference's
unlabeled sources.
"""

from __future__ import annotations

import os
import zipfile
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "ImageFolderDataset",
    "ArrayDataset",
    "SubsetDataset",
    "HFImageDataset",
    "ensure_extracted",
]

_IMG_EXTS = (".jpg", ".jpeg", ".png")


def ensure_extracted(zip_path: str, extract_dir: str) -> str:
    """Extract ``zip_path`` into ``extract_dir`` once.

    Completion is tracked with a sentinel file written AFTER extractall, so
    an interrupted extraction is retried instead of silently training on a
    partial dataset.

    A DIRECTORY ``zip_path`` is treated as an already-extracted corpus root
    and returned as-is — without this, a directory argument was silently
    IGNORED whenever ``extract_dir`` already carried a sentinel from some
    other corpus (the r4 natface run trained on the wrong dataset that way).
    """
    if os.path.isdir(zip_path):
        return zip_path
    os.makedirs(extract_dir, exist_ok=True)
    sentinel = os.path.join(extract_dir, ".extraction_complete")
    if os.path.exists(sentinel):
        return extract_dir
    if not os.path.exists(zip_path):
        # migration / zip-deleted case: trust pre-existing images rather
        # than crash; a missing-zip + empty-dir combination still errors
        has_images = any(
            fn.lower().endswith(_IMG_EXTS)
            for _r, _d, files in os.walk(extract_dir)
            for fn in files
        )
        if has_images:
            with open(sentinel, "w") as f:
                f.write("(adopted existing extraction; zip absent)")
            return extract_dir
        raise FileNotFoundError(zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(extract_dir)
    with open(sentinel, "w") as f:
        f.write(os.path.basename(zip_path))
    return extract_dir


class ImageFolderDataset:
    """Recursive image-folder dataset with corrupt-image tolerance.

    ``on_corrupt``: "next" replaces a broken image with its (idx+1) % len
    neighbor (reference zip-loader behavior), "zeros" yields a black
    placeholder (reference HF behavior), "raise" propagates.

    Decode path: when the native C++ pipeline is available and the transform
    is the standard CelebA chain (``crop``/``initial_resize`` args given),
    decode+transform runs GIL-free in C (libjpeg/libpng); otherwise PIL.
    """

    def __init__(
        self,
        root: Optional[str],
        transform: Callable,
        on_corrupt: str = "next",
        img_size: int = 64,
        crop: Optional[int] = None,
        initial_resize: Optional[int] = None,
        use_native: bool = True,
        paths: Optional[Sequence[str]] = None,
    ):
        self.root = root
        self.transform = transform
        self.on_corrupt = on_corrupt
        self.img_size = img_size
        self.crop = crop
        self.initial_resize = initial_resize
        if paths is not None:
            # explicit path list (e.g. a train/valid/test slice) — the
            # corrupt-neighbor fallback then stays INSIDE the slice; an
            # empty slice is legal (e.g. a tiny dataset's valid split)
            self.paths = list(paths)
        else:
            self.paths = sorted(
                os.path.join(dp, fn)
                for dp, _dn, files in os.walk(root)
                for fn in files
                if fn.lower().endswith(_IMG_EXTS)
            )
            if not self.paths:
                raise FileNotFoundError(f"no images under {root!r}")
        # the native C++ decode path substitutes the standard CelebA chain,
        # so it only activates when the transform itself declares that chain
        # (make_celeba_transform attaches ._celeba_chain) and it matches
        chain = getattr(transform, "_celeba_chain", None)
        self._native = False
        if (
            use_native
            and chain is not None
            and chain.get("img_size") == img_size
            and chain.get("crop") == crop
            and chain.get("initial_resize") == initial_resize
        ):
            from ..native import native_available

            self._native = native_available()

    def __len__(self) -> int:
        return len(self.paths)

    def _load(self, idx: int) -> np.ndarray:
        if self._native:
            from ..native import decode_image_file

            out = decode_image_file(
                self.paths[idx],
                out_size=self.img_size,
                crop=self.crop or 0,
                init_resize=self.initial_resize or 0,
            )
            if out is not None:
                return out
            # fall through to PIL, which raises on true corruption
        from PIL import Image

        with Image.open(self.paths[idx]) as img:
            return self.transform(img)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        tried = 0
        i = idx
        while True:
            try:
                return self._load(i), 0
            except Exception:
                if self.on_corrupt == "zeros":
                    return (
                        np.zeros((self.img_size, self.img_size, 3), np.float32),
                        0,
                    )
                if self.on_corrupt == "next":
                    tried += 1
                    if tried >= len(self.paths):
                        raise
                    i = (i + 1) % len(self.paths)
                    continue
                raise


class ArrayDataset:
    """In-memory (N, H, W, C) array as a dataset (synthetic/test data)."""

    def __init__(self, array: np.ndarray, labels: Optional[np.ndarray] = None):
        self.array = np.asarray(array, dtype=np.float32)
        self.labels = labels

    def __len__(self) -> int:
        return len(self.array)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        y = int(self.labels[idx]) if self.labels is not None else 0
        return self.array[idx], y


class SubsetDataset:
    """Seeded random subset without replacement (``subset_celebra.py:5-61``)."""

    def __init__(self, dataset, max_samples: int = 100_000, seed: int = 42):
        self.dataset = dataset
        n = min(int(max_samples), len(dataset))
        rng = np.random.default_rng(seed)
        self.indices = rng.choice(len(dataset), size=n, replace=False)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int):
        return self.dataset[int(self.indices[idx])]


class HFImageDataset:
    """HuggingFace image dataset (CelebA-HQ-256 path, ``celebraHQ.py:11-94``).

    Decodes lazily per item; corrupt images become zeros placeholders; the
    split falls back "default" -> "train" like the reference.
    """

    def __init__(
        self,
        name: str = "eurecom-ds/celeba-hq-256",
        split: str = "default",
        transform: Optional[Callable] = None,
        image_key: str = "image",
        img_size: int = 256,
        cache_dir: Optional[str] = None,
    ):
        from datasets import load_dataset  # HF

        try:
            self.ds = load_dataset(name, split=split, cache_dir=cache_dir)
        except Exception:
            self.ds = load_dataset(name, split="train", cache_dir=cache_dir)
        self.transform = transform
        self.image_key = image_key
        self.img_size = img_size

    def __len__(self) -> int:
        return len(self.ds)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        try:
            img = self.ds[int(idx)][self.image_key]
            if self.transform is not None:
                return self.transform(img), 0
            arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
            return arr * 2.0 - 1.0, 0
        except Exception:
            return np.zeros((self.img_size, self.img_size, 3), np.float32), 0
