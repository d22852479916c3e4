"""Harvest 256px faces from the reference repo's PUBLISHED 256px galleries.

Round-4 (`scripts/r4/harvest_ref_faces.py`) built the 64px natural-image
corpus this framework trains on under zero egress; this is the 256px
sibling the VERDICT-r5 #2 item asks for: the reference's flagship output is
trained CelebA-HQ-256 galleries (`/root/reference/README.md:29-39`,
`inference_256celeba/`, `samples_256celeba/`), committed as 1034x1034 PNGs
= 4x4 grids of 256px tiles with 2px padding.  Splitting those grids back
into single faces yields a ~350-image photographic 256px corpus — the
reference's own published artifacts, i.e. data we are allowed to have
offline.

Also harvests the FINAL column of each 256px denoise strip (2582x260 = 10
cells, 4388x260 = 17 cells; the last cell is the clean sample).

Output: JPEGs under data/celeba_ref256/celeba/ (zip-loader layout).

  python scripts/r5/harvest_ref_faces256.py
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
from PIL import Image

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "..",
                   "data", "celeba_ref256", "celeba")

# 256px attn-run grids whose samples are still early/mid-training mush —
# inspected one cell per epoch grid: e016-e044 are washed-out proto-faces,
# e056+ are photographic (the run's fixed sampling seed means each epoch
# grid redraws the same 16 identities, so dropping the bad epochs loses
# quality duplicates, not identities)
EXCLUDE = [
    r"attn_samples_e00[069]\.png$",
    r"attn_samples_e01[24]\.png$",
    r"attn_samples_e0(1[68]|2[0-9]|3[0-9]|4[0-9])\.png$",
]


def cells(img: np.ndarray, cell: int, rows: int, cols: int, pad: int = 2):
    for i in range(rows):
        for j in range(cols):
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
        arr = np.asarray(im)
        if (w, h) == (1034, 1034):
            faces = list(cells(arr, 256, 4, 4))
        elif h == 260 and (w - 2) % 258 == 0:
            # 256px denoise strip: keep only the final (clean) cell
            ncols = (w - 2) // 258
            faces = [list(cells(arr, 256, 1, ncols))[-1]]
        else:
            continue
        sources += 1
        for c in faces:
            Image.fromarray(c).save(
                os.path.join(OUT, f"face_{count:04d}.jpg"), quality=95)
            count += 1
    print(f"harvested {count} faces at 256px from {sources} grids -> {OUT}")


if __name__ == "__main__":
    main()


