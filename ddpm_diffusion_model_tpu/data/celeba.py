"""CelebA / CelebA-HQ loader factories — the reference's four entry points.

API parity (SURVEY.md §2.4):
- :func:`get_celeba_loaders`          <- ``load_data_from_torch.py:4-59``
  (torchvision download path; gated — falls back to a local image root when
  torchvision isn't installed)
- :func:`get_celeba_loader_from_zip`  <- ``load_data_local.py:8-109``
- :func:`build_hf_image_loader`       <- ``celebraHQ.py:11-94``
- :func:`create_subset_dataloader`    <- ``subset_celebra.py:5-61``
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .datasets import (
    ArrayDataset,
    HFImageDataset,
    ImageFolderDataset,
    SubsetDataset,
    ensure_extracted,
)
from .loader import DataLoader
from .transforms import make_celeba_transform

__all__ = [
    "get_celeba_loaders",
    "get_celeba_loader_from_zip",
    "build_hf_image_loader",
    "create_subset_dataloader",
]


def get_celeba_loaders(
    data_dir: str = "data",
    img_size: int = 64,
    batch_size: int = 128,
    num_workers: int = 8,
    seed: int = 0,
    download: bool = True,
) -> Tuple[DataLoader, DataLoader, DataLoader]:
    """(train, valid, test) CelebA loaders with the reference transform
    (CenterCrop 178 -> Resize -> [-1,1]).

    Uses torchvision's downloader when available.  Otherwise expects the
    aligned images under ``data_dir/celeba/img_align_celeba`` and splits by
    the official ``list_eval_partition.txt`` when present (the same
    partition torchvision's ``split=`` argument consumes,
    ``load_data_from_torch.py:13-31``), falling back to index counts
    matching the official partition sizes (162770/19867/19962).
    """
    transform = make_celeba_transform(img_size=img_size, crop=178)
    root = os.path.join(data_dir, "celeba", "img_align_celeba")

    try:
        import torchvision  # noqa: F401
    except ImportError:
        torchvision = None
    if torchvision is not None:
        try:
            return _celeba_via_torchvision(
                data_dir, img_size, batch_size, num_workers, seed, download,
                transform,
            )
        except Exception as e:
            # offline / checksum failure: fall back to a local image root
            # when one exists (zero-egress environments)
            if not os.path.isdir(root):
                raise
            print(f"[DATA] torchvision CelebA unavailable ({e}); using local root {root}")

    return _celeba_offline_loaders(
        data_dir, root, transform, img_size, batch_size, num_workers, seed
    )


def _celeba_offline_loaders(
    data_dir, root, transform, img_size, batch_size, num_workers, seed
):
    """Local-folder CelebA with official-partition splits when
    ``list_eval_partition.txt`` is present."""
    probe = ImageFolderDataset(
        root, transform, on_corrupt="next", img_size=img_size, crop=178
    )
    all_paths = probe.paths

    partition = _read_eval_partition(os.path.join(data_dir, "celeba"))
    if partition is not None:
        by_split = {0: [], 1: [], 2: []}
        for p in all_paths:
            by_split.setdefault(partition.get(os.path.basename(p), 0), []).append(p)
        splits = (by_split[0], by_split[1], by_split[2])
    else:
        n = len(all_paths)
        if n >= 202599:
            # full aligned corpus without the partition file: use the
            # official boundaries directly (train 162770 / valid 19867 /
            # test rest) — the images are index-ordered, so this IS the
            # official partition
            n_train, n_valid = 162770, 19867
        else:
            n_train = int(n * 0.8)
            n_valid = max(0, (n - n_train) // 2)
        splits = (
            all_paths[:n_train],
            all_paths[n_train : n_train + n_valid],
            all_paths[n_train + n_valid :],
        )

    def mk(paths, sh):
        # per-split datasets over path slices: the corrupt-neighbor fallback
        # cannot cross split boundaries
        ds = ImageFolderDataset(
            root, transform, on_corrupt="next", img_size=img_size, crop=178,
            paths=paths,
        )
        return DataLoader(ds, batch_size, shuffle=sh, seed=seed,
                          num_workers=num_workers)

    train_p, valid_p, test_p = splits
    return (mk(train_p, True), mk(valid_p, False), mk(test_p, False))


def _read_eval_partition(celeba_dir: str):
    """Parse the official ``list_eval_partition.txt`` ("000001.jpg 0" per
    line; 0=train 1=valid 2=test) if present.  Returns {basename: split_id}
    or None."""
    path = os.path.join(celeba_dir, "list_eval_partition.txt")
    if not os.path.exists(path):
        return None
    mapping = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                try:
                    mapping[parts[0]] = int(parts[1])
                except ValueError:
                    continue
    return mapping or None


def _celeba_via_torchvision(
    data_dir, img_size, batch_size, num_workers, seed, download, transform
):
    from torchvision import datasets as tvd

    class _TV:
        def __init__(self, split):
            self.ds = tvd.CelebA(root=data_dir, split=split, download=download)

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            img, _attrs = self.ds[i]
            return transform(img), 0

    mk = lambda split, sh: DataLoader(
        _TV(split), batch_size, shuffle=sh, seed=seed, num_workers=num_workers
    )
    return mk("train", True), mk("valid", False), mk("test", False)


def get_celeba_loader_from_zip(
    zip_path: str,
    extract_dir: str = "data/celeba_zip",
    img_size: int = 64,
    batch_size: int = 128,
    num_workers: int = 8,
    seed: int = 0,
    on_corrupt: str = "next",
    crop: Optional[int] = 178,
) -> DataLoader:
    """Extract-once zip loader with the extra leading Resize(178) and
    broken-image neighbor fallback (``load_data_local.py``).

    ``crop``: the CelebA-aligned face crop (178, the reference's chain).
    Pass ``None`` for pre-cropped square corpora (e.g. a CelebA-HQ-256
    zip): the chain becomes a plain resize to ``img_size``."""
    root = ensure_extracted(zip_path, extract_dir)
    initial = 178 if crop is not None else None
    transform = make_celeba_transform(img_size=img_size, crop=crop,
                                      initial_resize=initial)
    ds = ImageFolderDataset(
        root, transform, on_corrupt=on_corrupt, img_size=img_size,
        crop=crop, initial_resize=initial,
    )
    return DataLoader(ds, batch_size, shuffle=True, seed=seed, num_workers=num_workers)


def build_hf_image_loader(
    name: str = "eurecom-ds/celeba-hq-256",
    split: str = "default",
    img_size: int = 256,
    batch_size: int = 8,
    num_workers: int = 8,
    seed: int = 0,
    cache_dir: Optional[str] = None,
    smoke_test: bool = True,
) -> DataLoader:
    """HF CelebA-HQ-256 loader: zeros placeholder for corrupt images, seeded
    shuffling, optional first-batch smoke test (``celebraHQ.py:88-92``)."""
    transform = (
        make_celeba_transform(img_size=img_size, crop=None)
        if img_size != 256
        else None
    )
    ds = HFImageDataset(
        name=name, split=split, transform=transform, img_size=img_size,
        cache_dir=cache_dir,
    )
    loader = DataLoader(
        ds, batch_size, shuffle=True, seed=seed, num_workers=num_workers
    )
    if smoke_test:
        x, y = next(iter(loader))
        assert x.shape[1:] == (img_size, img_size, 3), x.shape
        assert np.isfinite(x).all()
        loader.set_epoch(0)  # don't consume an epoch's shuffle
    return loader


def create_subset_dataloader(
    dataset,
    batch_size: int = 128,
    max_samples: int = 100_000,
    seed: int = 42,
    num_workers: int = 8,
) -> DataLoader:
    """Seeded random-subset loader (``subset_celebra.py:5-61``).  Accepts any
    dataset object or a raw (N,H,W,C) array."""
    if isinstance(dataset, np.ndarray):
        dataset = ArrayDataset(dataset)
    sub = SubsetDataset(dataset, max_samples=max_samples, seed=seed)
    return DataLoader(sub, batch_size, shuffle=True, seed=seed, num_workers=num_workers)
