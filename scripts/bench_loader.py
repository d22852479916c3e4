"""Input-pipeline throughput: native C++ decode vs PIL, single and threaded.

Generates a synthetic JPEG corpus, then measures imgs/s through
ImageFolderDataset + DataLoader with both decode paths.

    python scripts/bench_loader.py [--n 512] [--workers 8]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=64)
    ap.add_argument("--src", default="celeba", choices=["celeba", "hq256"],
                    help="source corpus: CelebA-aligned 178x218 (crop 178) "
                         "or CelebA-HQ-style 256x256 (no crop)")
    args = ap.parse_args()

    from PIL import Image

    from ddpm_diffusion_model_tpu.data import DataLoader, ImageFolderDataset
    from ddpm_diffusion_model_tpu.data.transforms import make_celeba_transform
    from ddpm_diffusion_model_tpu.native import native_available

    if args.src == "hq256":
        src_shape, crop = (256, 256, 3), None
        args.img_size = 256
    else:
        src_shape, crop = (218, 178, 3), 178

    root = tempfile.mkdtemp(prefix="loaderbench_")
    rng = np.random.default_rng(0)
    for i in range(args.n):
        arr = (rng.random(src_shape) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"{i:05d}.jpg"), quality=95)

    transform = make_celeba_transform(args.img_size, crop=crop)
    print(f"corpus: {args.n} jpegs {src_shape} -> {args.img_size}px"
          f" | native_available={native_available()}")

    for use_native, label in ((True, "native C++"), (False, "PIL")):
        ds = ImageFolderDataset(
            root, transform, img_size=args.img_size, crop=crop,
            use_native=use_native,
        )
        dl = DataLoader(ds, 64, shuffle=False, num_workers=args.workers,
                        drop_last=False)
        # warm one epoch (page cache), then time
        for _ in dl:
            pass
        t0 = time.perf_counter()
        count = 0
        for x, _ in dl:
            count += x.shape[0]
        dt = time.perf_counter() - t0
        print(f"{label:10s} x{args.workers} workers: {count / dt:8.0f} imgs/s")

    import shutil

    shutil.rmtree(root)


if __name__ == "__main__":
    main()
